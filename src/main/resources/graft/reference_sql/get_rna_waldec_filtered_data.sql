SELECT * 
FROM `assofinder.crm.rna_waldec_filtered`
WHERE filtered_cat ='yes'