"""Auxiliary subsystems: metrics, profiling, manifests, fault handling."""
