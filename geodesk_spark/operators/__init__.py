"""Engine operators: tiling, spatial joins, kNN, dedup, ANN, text, images."""
