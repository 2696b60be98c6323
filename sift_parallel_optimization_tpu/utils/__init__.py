"""Utilities: native runtime bindings, profiling, trajectories, checkpoints."""
