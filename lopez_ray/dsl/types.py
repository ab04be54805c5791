"""The lopez static type lattice and its Arrow mapping.

Mirrors ``/root/reference/lib-lopez/src/type.rs:12-19``:
``Any | Bool | Number | String | Array(T) | Map(String -> T)``.

Rule types are computed statically before a crawl starts, so each rule name
becomes a fixed Arrow column in the per-page analyses output
(SURVEY.md §1.2): Bool→bool_, Number→float64 (the reference coerces all
numerics through force_f64), String→large_utf8, Array(T)→list_(T),
Map(String→T)→map_(large_utf8, T), Any→string (JSON-encoded).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa


class Type:
    """Base class; concrete types below. Immutable and hashable."""

    def is_map(self) -> bool:
        return isinstance(self, MapT)

    def to_arrow(self) -> pa.DataType:
        raise NotImplementedError


@dataclass(frozen=True)
class AnyT(Type):
    def __str__(self) -> str:
        return "any"

    def to_arrow(self) -> pa.DataType:
        return pa.large_utf8()  # JSON-encoded


@dataclass(frozen=True)
class BoolT(Type):
    def __str__(self) -> str:
        return "bool"

    def to_arrow(self) -> pa.DataType:
        return pa.bool_()


@dataclass(frozen=True)
class NumberT(Type):
    def __str__(self) -> str:
        return "number"

    def to_arrow(self) -> pa.DataType:
        return pa.float64()


@dataclass(frozen=True)
class StringT(Type):
    def __str__(self) -> str:
        return "string"

    def to_arrow(self) -> pa.DataType:
        return pa.large_utf8()


@dataclass(frozen=True)
class ArrayT(Type):
    inner: Type

    def __str__(self) -> str:
        return f"array[{self.inner}]"

    def to_arrow(self) -> pa.DataType:
        return pa.list_(self.inner.to_arrow())


@dataclass(frozen=True)
class MapT(Type):
    inner: Type

    def __str__(self) -> str:
        return f"map[string, {self.inner}]"

    def to_arrow(self) -> pa.DataType:
        return pa.map_(pa.large_utf8(), self.inner.to_arrow())


ANY = AnyT()
BOOL = BoolT()
NUMBER = NumberT()
STRING = StringT()


class TypeError_(Exception):
    """Type error raised at directives load time (never at eval time)."""
