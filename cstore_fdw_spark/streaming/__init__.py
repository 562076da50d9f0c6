"""Structured Streaming extension (the reference is batch-append only;
SURVEY §2.B marks streaming as engine extension)."""
