"""Data-shaping operators: profiling, DQ rules, PII, SCD, dedup,
similarity, multimodal."""
