"""Multi-device / multi-host parallelism: pair-grid-sharded matching
(`matching`), multi-host scaffolding (`distributed`: jax.distributed
initialization, host-sharded input, run_ba_multihost). Sharded bundle
adjustment lives in sfm_danpipeline_tpu.ba.sharded."""
