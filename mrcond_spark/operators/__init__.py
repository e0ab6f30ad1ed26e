"""Custom operators not expressible as a single built-in Spark primitive.

Each module documents the reference/north-star contract it implements and the
100 TB scaling argument for its physical strategy.
"""
