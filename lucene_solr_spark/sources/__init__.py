"""Sources: deterministic synthetic corpus generation (the Iceberg-shaped
source-code table from BASELINE.json input_hint) and test-data catalogs."""
