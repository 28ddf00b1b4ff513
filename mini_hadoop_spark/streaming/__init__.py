"""Structured Streaming operators — beyond the reference (which has no
streaming at all, SURVEY.md §2.3); part of the driver-contract extension
surface."""
