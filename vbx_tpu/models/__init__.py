"""Embedding models and DSP frontend (JAX/Flax)."""
