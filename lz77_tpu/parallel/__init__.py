"""Mesh, shard_map and multi-host orchestration."""
