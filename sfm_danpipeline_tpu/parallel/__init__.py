"""Multi-device parallelism: mesh helpers, pair-grid-sharded matching.
Sharded bundle adjustment lives in sfm_danpipeline_tpu.ba.sharded."""
