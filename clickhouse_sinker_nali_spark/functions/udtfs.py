"""Python UDTFs — the user-defined TABLE function extension surface.

The reference has no UDF/UDAF/UDTF surface at all (SURVEY §2.10: its only
extension points are the Go ``Parser``/``Inputer`` interfaces).  On Spark
the analytics layer inherits Python UDTFs (Spark 4): a class with an
``eval`` generator becomes a table function usable both from the DataFrame
API and from SQL lateral joins after ``spark.udtf.register``.

UDTFs run row-at-a-time in Python workers — the SLOW path.  They are the
escape hatch for row→many-rows logic that built-ins can't express; when a
built-in CAN express it (as with ``explode_json_kv`` below, whose
production twin is ``explode(from_json(col, 'map<string,string>'))``),
the built-in wins at scale.  The pinning test asserts the UDTF matches its
JVM twin exactly, which is the pattern for validating any custom UDTF
before letting it near 100 TB.
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(returnType="key: string, value: string")
class ExplodeJsonKV:
    """(json_object_string) -> one (key, value) row per entry, keys sorted.

    Values re-serialize compactly (nested objects/arrays stay JSON text),
    matching the map<string,string> cast semantics of the JVM twin for
    scalar values.
    """

    def eval(self, props: str):  # noqa: D102
        if props is None:
            return
        try:
            obj = json.loads(props)
        except ValueError:
            return
        if not isinstance(obj, dict):
            return
        for k in sorted(obj):
            v = obj[k]
            if v is None:
                yield k, None
            elif isinstance(v, bool):
                yield k, "true" if v else "false"
            elif isinstance(v, (dict, list)):
                yield k, json.dumps(v, separators=(",", ":"))
            else:
                yield k, str(v)


def register_udtfs(spark) -> None:
    """Make the UDTF library callable from SQL lateral joins."""
    spark.udtf.register("explode_json_kv", ExplodeJsonKV)
