"""SPARQL text front end: parse -> algebra -> DataFrame plans against the
R2RML mapping (reference: rdflib_r2r/r2r_store.py:59-93 query dispatch,
rdflib_r2r/sql_converter.py:269-289 parse/convert/getSQL)."""

from rdflib_r2r_spark.sparql.parser import parse_query
from rdflib_r2r_spark.sparql.store import SparkR2RStore

__all__ = ["parse_query", "SparkR2RStore"]
