"""Offline data engineering: build the HDF5 cutout datasets from survey FITS
tiles + source catalogs (counterpart of the reference ``data_processing/``).

Pipeline stages (each usable as a function or module CLI):

1. ``create_h5.create_h5_dataset``  — cut catalog sources from FITS tiles
   into (N, C, S, S) cutouts with ra/dec/zspec[/class] columns
   (reference ``2_create_h5_files.py`` + ``data_processing/utils.py``);
2. ``combine.combine_h5_files``     — concatenate shard files
   (reference ``3_combine_h5_files.py`` / ``combine_h5.py``);
3. ``dedup.deduplicate_h5``         — kd-tree sky-position dedup
   (reference ``3b_remove_duplicates.ipynb``);
4. ``split.split_dataset``          — random train/val/test split
   (reference ``4_split_dataset.py``);
5. ``probe_sets.make_probe_set``    — balanced per-class linear-probe sets
   (reference ``4_linear_probe_datasets.ipynb``);
6. ``resolution.measure_resolution`` — survey pixel scale from WCS headers
   (reference ``resolution.py``).
"""
