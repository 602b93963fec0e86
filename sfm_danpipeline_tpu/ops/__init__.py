"""TPU compute primitives: features, matching, epipolar geometry, triangulation,
PnP, and supporting linear algebra — all pure, jittable, vmappable."""
