"""PySpark-native analytics engine with the capabilities of
shravyakarla/data-pipelines-snowflake-procedures.

The reference implements eight Snowflake Python stored procedures
(execution engine, file/table data-quality, PII masking, SCD1/join/agg
code generation, objective interpretation, business glossary). This
package re-expresses that surface Spark-first: Spark SQL / Catalyst is
the query engine; these modules are the pipeline / data-quality /
profiling / masking / codegen library on top, extended with the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) the reference's domain implies.

Layout (SURVEY.md §7):
    session        SparkSession builder + table registry helpers
    plans/         execution engine (X1/X2), codegen (X4, G1-G5),
                   objective interpreter (M4), business glossary
    operators/     profiling (Q7), DQ rules (Q1-Q6), PII (PI1-PI4),
                   SCD1 merge (G1/W1), dedup, similarity, multimodal
    sources/       file discovery readers (S1-S5), catalog ops (M1-M3)
    functions/     column-expression builders (masking F1-F6, text
                   analysis) and driver-side SQL text tools (F7-F10)
    streaming/     event-window aggregation (batch + structured)
"""

__version__ = "0.1.0"
