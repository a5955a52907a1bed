"""Utilities: checkpointing, torch-checkpoint import, structured logging."""
