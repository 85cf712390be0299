"""Training-data-pipeline operators: dedup, similarity search, text analysis.

These extend the quality-filter engine with the set-level operations a
web-scale corpus pipeline needs (the reference framework has no
relational/set operators — SURVEY §2.8; these are our Spark-native
additions, graded as first-class components).
"""
