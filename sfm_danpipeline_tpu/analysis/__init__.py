"""Analysis tail: cloud filtering, segmentation, dendrometry, normals.
The TPU-native equivalents of the reference's PCL stages
(src/Sfm.cpp:1323-1397, src/Segmentation.cpp, src/DendrometryE.cpp)."""
