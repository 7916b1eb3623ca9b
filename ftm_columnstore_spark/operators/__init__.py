from ftm_columnstore_spark.operators.assembly import assemble_entities
from ftm_columnstore_spark.operators.graph import adjacent, inverted, reverse_ids

__all__ = ["adjacent", "assemble_entities", "inverted", "reverse_ids"]
