"""Orchestration-level modules: execution engine, codegen, interpreter,
glossary."""
