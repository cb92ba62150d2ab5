"""Hidden-partitioning transforms: identity, year, month, day, hour,
bucket[N], truncate[W].

Mirrors the reference's client-side spec building and row-level
transform application
(/root/reference/ice/src/main/java/com/altinity/ice/cli/internal/iceberg/Partitioning.java:84-145,318-391)
— but as Spark Column expressions, so the partitioned fan-out write
is a single declarative job instead of an in-memory Map<PartitionKey,
List<Record>>.

bucket[N] and numeric truncate[W] follow the Iceberg Table Spec
(Appendix B) exactly — murmur3_x86_32 of the spec's byte
serialization, floor-mod truncation — via
`ice_spark.catalog.iceberg_transforms`, so partition values written
here are byte-compatible with what any Iceberg reader computes and
the exported spec keeps those fields (the reference gets the same
property from the Iceberg library's client-side transforms,
ice/.../iceberg/Partitioning.java:84-145).
"""

from __future__ import annotations

import dataclasses
import re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as SPT

_TRANSFORM_RE = re.compile(r"^(\w+)(?:\[(\d+)\])?$")


@dataclasses.dataclass(frozen=True)
class PartitionField:
    column: str
    transform: str  # identity|year|month|day|hour|bucket|truncate
    param: int | None = None  # bucket N / truncate W
    name: str | None = None  # custom partition-path name

    @property
    def field_name(self) -> str:
        if self.name:
            return self.name
        if self.transform == "identity":
            return self.column
        if self.param is not None:
            return f"{self.column}_{self.transform}_{self.param}"
        return f"{self.column}_{self.transform}"

    def expr(self, dtype: SPT.DataType | None = None) -> Column:
        """Partition-value Column. `dtype` (the source column's Spark
        type) is required for bucket and non-string truncate, whose
        Iceberg-spec semantics are type-dependent."""
        c = F.col(self.column)
        t = self.transform
        if t == "identity":
            return c
        if t == "year":
            return F.year(c)
        if t == "month":
            # Iceberg months-since-epoch would also work; rendered
            # form yyyy-MM matches the reference's path style.
            return F.date_format(c, "yyyy-MM")
        if t == "day":
            return F.date_format(c, "yyyy-MM-dd")
        if t == "hour":
            return F.date_format(c, "yyyy-MM-dd-HH")
        if t == "bucket":
            from ice_spark.catalog.iceberg_transforms import bucket_expr

            if dtype is None:
                raise ValueError(
                    f"bucket[{self.param}] on {self.column} needs the "
                    "source column dtype (pass df.schema[col].dataType)"
                )
            return bucket_expr(c, dtype, self.param)
        if t == "truncate":
            from ice_spark.catalog.iceberg_transforms import truncate_expr

            if dtype is None or isinstance(dtype, SPT.StringType):
                return F.substring(c.cast("string"), 1, self.param)
            return truncate_expr(c, dtype, self.param)
        raise ValueError(f"unknown transform: {t}")

    def to_json(self) -> dict:
        return dataclasses.asdict(self)


def parse_partition_spec(spec: list[dict]) -> list[PartitionField]:
    """Parse the reference's JSON partition spec format:
    [{"column": "ts", "transform": "year"|"bucket[16]"|..., "name": opt}]
    (cf. IcePartition at ice/.../cli/Main.java:311-319).
    """
    fields = []
    for item in spec:
        tr = item.get("transform", "identity")
        m = _TRANSFORM_RE.match(tr)
        if not m:
            raise ValueError(f"bad transform: {tr}")
        name, param = m.group(1), m.group(2)
        name = name.lower()
        if name not in {"identity", "year", "month", "day", "hour", "bucket", "truncate"}:
            raise ValueError(f"unknown transform: {name}")
        if name in {"bucket", "truncate"} and param is None:
            raise ValueError(f"{name} requires a parameter, e.g. {name}[16]")
        fields.append(
            PartitionField(
                column=item["column"],
                transform=name,
                param=int(param) if param else None,
                name=item.get("name"),
            )
        )
    return fields


@dataclasses.dataclass(frozen=True)
class SortField:
    column: str
    desc: bool = False
    null_first: bool | None = None  # default: asc->nulls first, desc->nulls last

    def expr(self) -> Column:
        c = F.col(self.column)
        nf = self.null_first if self.null_first is not None else not self.desc
        if self.desc:
            return c.desc_nulls_first() if nf else c.desc_nulls_last()
        return c.asc_nulls_first() if nf else c.asc_nulls_last()

    def to_json(self) -> dict:
        return dataclasses.asdict(self)


def parse_sort_order(spec: list[dict]) -> list[SortField]:
    """[{"column": c, "desc": bool, "nullFirst": bool}] — cf.
    IceSortOrder at ice/.../cli/Main.java:311-319 and
    RecordComparator.java:20-54 null/direction semantics."""
    return [
        SortField(
            column=i["column"],
            desc=bool(i.get("desc", False)),
            null_first=i.get("nullFirst"),
        )
        for i in spec
    ]
