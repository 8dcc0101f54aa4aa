"""Operators: ingest pipeline + large-scale data-pipeline extensions."""
