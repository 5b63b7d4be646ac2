"""Application workers: the pipeline stages of the reference
(init -> grid -> klean/spotless -> model2comps -> degrid -> restore,
pfb/workers/) as plain functions over the npz-MS / directory-store
formats. Host code orchestrates; all compute is jitted pfb_tpu ops."""
