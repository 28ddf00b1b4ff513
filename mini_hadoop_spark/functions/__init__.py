"""Reusable Catalyst expression builders (no UDFs) shared by the
operator modules: tokenization, shingling, deterministic rounding."""
