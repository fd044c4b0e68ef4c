"""Agent-style workflow pipelines: code generation, objective
interpretation, business glossary, and the ingestion orchestrator
(reference §2.9/§2.12 surfaces)."""
