"""JSON construction with the reference's semantics.

``JSON_OBJECT('k' VALUE v, ...)`` in the reference returns a JSON **string**,
not a structured value — proven by the failed insert into a ``ROW<>`` column
(reference ``README.md:576-594``) and stated at ``README.md:598``. Spark's
``to_json(struct(...))`` has exactly this semantic; :func:`json_object`
packages it with the reference's key-VALUE call shape.

Nested values (arrays of structs, e.g. the ``products`` column,
``README.md:417``) are serialized structurally, matching the reference's
``CAST(products AS STRING)`` prompt-assembly usage (``README.md:726-730``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_object(**kv: Column | str) -> Column:
    """Build a JSON *string* column from keyword key/value pairs.

    ``json_object(role=F.col("role"), prompt=F.lit("hi"))`` ≍ Flink
    ``JSON_OBJECT('role' VALUE role, 'prompt' VALUE 'hi')``
    (reference ``README.md:504-507, 726-730``).
    """
    cols = [
        (F.col(v) if isinstance(v, str) else v).alias(k) for k, v in kv.items()
    ]
    return F.to_json(F.struct(*cols))
