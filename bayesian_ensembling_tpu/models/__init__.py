"""Emulator families: mean-field Gaussian, GPDTW1D, GPDTW3D (reference ensembles/models.py)."""
