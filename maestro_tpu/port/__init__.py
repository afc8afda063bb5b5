"""Checkpoint porting (torch reference weights -> JAX param trees)."""
