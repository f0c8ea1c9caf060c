"""bigdataproj_spark — a PySpark-native analytics engine.

A from-scratch engine with (at least) the query and data-processing
capabilities of the reference course project ``AyasSharqawe/BigDataProj``
(see SURVEY.md; reference capability surface is declared entirely in its
``README.md:1-110`` — all six Scala sources are empty stubs).

Architecture: DataFrame/SQL on Catalyst for the relational core,
Structured Streaming for the streaming surface, Arrow-vectorized pandas
UDFs only where native expressions cannot express an operator.
"""

__version__ = "0.1.0"
