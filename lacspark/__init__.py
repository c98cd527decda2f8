"""lacspark — PySpark-native lexical-analysis + KG-construction engine.

A brand-new engine with the query/data-processing capabilities of
baidu/lac (joint segmentation, POS tagging, NER, word-importance rank,
customization-dict intervention), re-expressed Spark-first: the
GRU-CRF tagger runs as Arrow-batched pandas UDFs over DataFrames and
is extended into a knowledge-graph construction pipeline (mentions,
triples, minhash/LSH canonicalization, connected components, graph
materialize) over a `(repo, path, commit, lang, content)` corpus.

See SURVEY.md for the structural derivation from the reference.
"""

__version__ = "0.1.0"

from pathlib import Path

RESOURCE_DIR = Path(__file__).resolve().parent / "resources"
