"""Metadata artifact + viewer (reference `view` subcommand)."""

from .serialize import save_metadata, load_metadata

__all__ = ["save_metadata", "load_metadata"]
