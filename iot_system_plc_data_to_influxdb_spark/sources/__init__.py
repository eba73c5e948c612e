"""Data sources: the PLC polling source (simulator + snap7 stub) and
XML config ingestion."""
