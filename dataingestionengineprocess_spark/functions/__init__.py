"""Column-expression helpers: vector math and text analysis.

Everything here returns Spark Column expressions built from built-in
higher-order functions -- JVM-side, whole-stage-codegen'd, no Python
UDFs. These are the scalar vocabulary for the dedup / similarity /
text operators (SURVEY.md §2.7 [C] rows).
"""
