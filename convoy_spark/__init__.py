"""convoy-spark: a PySpark-native analytics engine with the query and
data-processing capabilities of dhh22/convoy-data-pipeline, rebuilt
Spark-first (DataFrame/SQL/Catalyst/Structured Streaming) rather than
ported. See SURVEY.md for the blueprint and the full file:line mapping
to the reference.
"""

__version__ = "0.1.0"
