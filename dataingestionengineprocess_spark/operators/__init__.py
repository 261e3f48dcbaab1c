"""Composable library operators.

Each operator is a function DataFrame(s) -> DataFrame built from
declarative Spark ops, so Catalyst plans the whole tree (SURVEY.md §4:
zero custom Catalyst rules). Operators the reference-class engine
needs but Spark lacks natively (MinHash/SimHash near-dup, LSH ANN,
as-of join) live here as compositions; nothing drops to RDDs.
"""
