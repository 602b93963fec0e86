"""Dense multi-view stereo: TPU plane-sweep depth estimation + multi-view
fusion — the from-scratch replacement for the reference's out-of-process
PMVS2 binary (programs/pmvs2, invoked at src/Sfm.cpp:63)."""
