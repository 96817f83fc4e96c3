"""Schema evolution (SURVEY §2 S10).

The reference manages this as database DDL: ``utils/db.py:26-120`` creates
the target table from the frame's dtypes and ALTERs it when a new upload
carries extra columns; the ``structure_change`` load mode
(``main.py:180-187``) re-ingests under the evolved schema. In Spark the
storage layer owns DDL (Iceberg: ``ALTER TABLE ... ADD COLUMN`` through the
catalog; plain parquet: ``mergeSchema``) — what the ENGINE must provide is:

  * a schema DIFF, so a run can decide whether it is looking at a
    structure change (→ load_mode='structure_change') and report it;
  * an evolved READ (union-of-schemas view over heterogeneous files);
  * frame ALIGNMENT to a target schema (add missing as nulls, cast
    compatible type widenings) so old and new batches validate under ONE
    rule compilation.

Scale note: ``mergeSchema`` reads every file footer at planning time —
that's metadata-sized (fine at 10^5 files); Iceberg does it for free from
the table metadata, so the cluster path never pays even that.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

# widenings that are always information-preserving — anything else is a
# TYPE CONFLICT the caller must resolve (the reference rejects those
# uploads; utils/db.py keeps the DB type authoritative)
_SAFE_WIDENINGS = {
    ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
    ("smallint", "int"), ("smallint", "bigint"),
    ("int", "bigint"),
    ("tinyint", "double"), ("smallint", "double"), ("int", "double"),
    ("bigint", "double"), ("float", "double"),
    ("date", "timestamp"),
}


@dataclass(frozen=True)
class SchemaDiff:
    added: list[str] = field(default_factory=list)       # in new, not in old
    removed: list[str] = field(default_factory=list)     # in old, not in new
    widened: list[str] = field(default_factory=list)     # safe type widening
    conflicting: list[str] = field(default_factory=list) # incompatible change

    @property
    def is_structure_change(self) -> bool:
        return bool(self.added or self.removed or self.widened or self.conflicting)


def schema_diff(old: StructType, new: StructType) -> SchemaDiff:
    """Column-level diff between two schemas (name-keyed, like the
    reference's dtype comparison in utils/db.py:77-104)."""
    old_types = {f.name: f.dataType.simpleString() for f in old.fields}
    new_types = {f.name: f.dataType.simpleString() for f in new.fields}
    added = [c for c in new_types if c not in old_types]
    removed = [c for c in old_types if c not in new_types]
    widened, conflicting = [], []
    for c, nt in new_types.items():
        ot = old_types.get(c)
        if ot is None or ot == nt:
            continue
        if (ot, nt) in _SAFE_WIDENINGS:
            widened.append(c)
        else:
            conflicting.append(c)
    return SchemaDiff(added, removed, widened, conflicting)


def evolved_read(spark: SparkSession, path: str) -> DataFrame:
    """Union-of-schemas read over a parquet directory whose files were
    written under different schemas; files lacking a column yield nulls.
    (Iceberg tables resolve this from table metadata — same call shape,
    zero footer cost.)"""
    return spark.read.option("mergeSchema", "true").parquet(path)


def align_to_schema(df: DataFrame, target: StructType) -> DataFrame:
    """Project ``df`` onto ``target``: missing columns become typed nulls,
    present columns are cast (safe widenings only — a conflicting cast is a
    caller decision, so this raises). Lets one compiled rule catalog
    validate batches written before AND after the evolution."""
    have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    cols = []
    for f in target.fields:
        want = f.dataType.simpleString()
        got = have.get(f.name)
        if got is None:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif got == want or (got, want) in _SAFE_WIDENINGS:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            raise ValueError(
                f"conflicting type change for column {f.name!r}: "
                f"{got} -> {want} is not a safe widening"
            )
    return df.select(*cols)
