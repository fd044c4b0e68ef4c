"""Event-window aggregation: batch F.window queries + Structured
Streaming variants."""
