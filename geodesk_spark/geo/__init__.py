"""Coordinate-system and tile-algebra kernels.

Pure numpy (no Spark dependency) plus Spark Column builders that keep
the same arithmetic JVM-side (whole-stage codegen) where possible.
"""
