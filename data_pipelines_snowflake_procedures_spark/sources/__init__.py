"""File discovery readers (S1-S5) and catalog metadata ops (M1-M4)."""
