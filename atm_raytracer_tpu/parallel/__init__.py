"""Multi-chip scaling: mesh construction + sharded renders (phase: parallel)."""
