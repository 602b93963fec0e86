"""From-scratch Levenberg-Marquardt bundle adjustment with Schur-complement
elimination of points — the TPU-native replacement for the reference's Ceres
solver (src/BundleAdjustment.cpp), and the framework's distributed centerpiece
(psum-sharded observation blocks over a device mesh)."""
