"""Host-side I/O: image loading, calibration parsing, point-cloud formats."""
