"""Single-threaded reference replayer — the correctness oracle.

Applies the change log in strict LSN order exactly as a faithful consumer of
the reference's stream would: the reference guarantees in-order delivery via
sequential ids (``/root/reference/cdc/sources/__init__.py:91-92``) and
at-least-once semantics (``cdc/producer.py:84-94``), so the oracle sorts by
LSN, drops duplicate LSNs, and applies insert/update/delete/truncate/
schema_change one event at a time to a plain dict. The engine's distributed
final state must byte-match this (per-row sha256(content) equality — the
BASELINE invariant).
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

import pandas as pd

BASE_COLUMNS = ("repo", "path", "commit", "lang", "content")
_TRUE = {"true", "t", "1", "y", "yes"}
_FALSE = {"false", "f", "0", "n", "no"}


_VALID_TYPES = {
    "string", "long", "int", "double", "boolean", "timestamp", "date",
    "map<string,string>",
}


def _valid_type(typ: str) -> bool:
    """Types the replay (and the engine's sql_type) can cast to; bare
    'decimal' without (p,s) is NOT one of them."""
    import re

    return typ in _VALID_TYPES or bool(
        re.fullmatch(r"decimal\(\d+,\s*\d+\)", typ or "")
    )


def _decimal_scale(typ: str) -> tuple[int, int]:
    p, s = typ[len("decimal("):-1].split(",")
    return int(p), int(s)


def _quantize(value, typ: str):
    """Decimal(p, s) semantics of Spark's cast: round HALF_UP to scale s,
    NULL on precision overflow (try_cast)."""
    import decimal

    p, s = _decimal_scale(typ)
    try:
        d = decimal.Decimal(str(value)).quantize(
            decimal.Decimal(1).scaleb(-s), rounding=decimal.ROUND_HALF_UP
        )
    except (decimal.InvalidOperation, ValueError):
        return None
    if len(d.as_tuple().digits) - s > p - s:  # integral digits exceed p-s
        return None
    return d


def cast_string(s: str | None, typ: str) -> Any:
    """Mirror Spark ANSI try_cast(string AS typ)."""
    import datetime

    if s is None:
        return None
    if typ == "string":
        return s
    v = s.strip()
    try:
        if typ in ("long", "int"):
            return int(v)
        if typ == "double":
            return float(v)
        if typ == "boolean":
            lv = v.lower()
            if lv in _TRUE:
                return True
            if lv in _FALSE:
                return False
            return None
        if typ == "timestamp":
            try:
                return datetime.datetime.fromisoformat(v)
            except ValueError:
                return None
        if typ == "date":
            try:
                return datetime.date.fromisoformat(v)
            except ValueError:
                return None
        if typ.startswith("decimal("):
            return _quantize(v, typ)
    except (ValueError, TypeError):
        return None
    raise ValueError(f"unsupported type {typ}")


def convert(value: Any, from_t: str, to_t: str) -> Any:
    """Mirror Spark try_cast(from_t AS to_t) on an already-typed value."""
    import datetime

    if value is None or from_t == to_t:
        return value
    if to_t == "string":
        if from_t == "boolean":
            return "true" if value else "false"
        # datetime/date/Decimal str() match Spark's cast-to-string rendering
        # ('YYYY-MM-DD HH:MM:SS[.ffffff]', 'YYYY-MM-DD', full-scale decimal)
        return str(value)
    if from_t == "string":
        return cast_string(value, to_t)
    if to_t.startswith("decimal("):
        return _quantize(value, to_t)
    if from_t == "timestamp":
        if to_t == "long":  # epoch seconds, UTC session
            epoch = datetime.datetime(1970, 1, 1)
            return int((value - epoch).total_seconds() // 1)
        if to_t == "date":
            return value.date()
        raise ValueError(f"unsupported conversion {from_t} -> {to_t}")
    if to_t == "timestamp":
        if from_t == "long":
            return datetime.datetime(1970, 1, 1) + datetime.timedelta(
                seconds=int(value)
            )
        if from_t == "date":
            return datetime.datetime(value.year, value.month, value.day)
        raise ValueError(f"unsupported conversion {from_t} -> {to_t}")
    if to_t == "double":
        return float(value)
    if to_t == "long":
        if from_t.startswith("decimal("):
            return int(value)  # truncate toward zero, like Spark
        return int(value)
    if to_t == "boolean":
        return bool(value)
    raise ValueError(f"unsupported conversion {from_t} -> {to_t}")


def replay(
    log: pd.DataFrame,
    base_fields: list[tuple[str, str]],
    key: tuple[str, ...] = ("repo", "path"),
    table: str = "repos",
) -> pd.DataFrame:
    """Replay the envelope log for one table; returns the final state with
    columns = final schema + _lsn + content_sha256 (when content survives)."""
    fields: list[tuple[str, str]] = list(base_fields)
    state: dict[tuple, dict] = {}

    sub = log[log["table"] == table].sort_values("lsn", kind="stable")
    sub = sub.drop_duplicates(subset=["lsn"], keep="first")

    for row in sub.itertuples(index=False):
        op = row.op
        if op in ("begin", "commit", "generic"):
            continue
        if op == "schema_change":
            # mirror the engine's poison-tolerance (lake.replay_changes):
            # unparseable JSON, add of an existing column, key-column
            # actions, unknown actions, and retype/drop of a missing column
            # are skipped, never fatal
            try:
                ch = json.loads(row.schema_change)
                action, column = ch["action"], ch["column"]
            except (ValueError, TypeError, KeyError):
                continue
            if column in key:
                continue
            names = [n for n, _ in fields]
            if action in ("add", "retype") and not _valid_type(
                ch.get("type", "string")
            ):
                # mirror lake.evolve_fields: an add/retype naming a type the
                # engine cannot cast to (e.g. 'varchar', bare 'decimal') is
                # poison — skipped deterministically, never fatal
                continue
            if action == "add" and column not in names:
                fields = fields + [(column, ch.get("type", "string"))]
                for st in state.values():
                    st[column] = None
            elif action == "drop":
                fields = [f for f in fields if f[0] != column]
                for st in state.values():
                    st.pop(column, None)
            elif action == "retype" and column in names and "type" in ch:
                old_t = dict(fields)[column]
                new_t = ch["type"]
                fields = [
                    (n, new_t if n == column else t) for n, t in fields
                ]
                for st in state.values():
                    st[column] = convert(st[column], old_t, new_t)
            continue
        if op == "truncate":
            state.clear()
            continue
        k = tuple(getattr(row, c) for c in key)
        if op == "delete":
            state.pop(k, None)
            continue
        # insert/update: upsert semantics (LWW)
        extra = row.extra if isinstance(row.extra, dict) else (row.extra or {})
        new_row: dict[str, Any] = {}
        for name, typ in fields:
            raw = getattr(row, name) if name in BASE_COLUMNS else extra.get(name)
            new_row[name] = cast_string(raw, typ)
        new_row["_lsn"] = row.lsn
        state[k] = new_row

    cols = [n for n, _ in fields] + ["_lsn"]
    if not state:
        return pd.DataFrame(columns=cols + ["content_sha256"])
    out = pd.DataFrame([state[k] for k in sorted(state)], columns=cols)
    if "content" in out.columns:
        out["content_sha256"] = out["content"].map(
            lambda c: hashlib.sha256(c.encode()).hexdigest() if c is not None else None
        )
    return out


def assert_matches(lake_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame,
                   key: tuple[str, ...] = ("repo", "path")) -> None:
    """Row-for-row equality of engine state vs oracle state (sorted by key),
    including the sha256(content) invariant."""
    cols = [c for c in oracle_pdf.columns if c != "_lsn"]
    if "content" in cols and "content_sha256" not in lake_pdf.columns:
        lake_pdf = lake_pdf.copy()
        lake_pdf["content_sha256"] = lake_pdf["content"].map(
            lambda c: hashlib.sha256(c.encode()).hexdigest() if c is not None else None
        )
    a = lake_pdf[cols].sort_values(list(key), kind="stable").reset_index(drop=True)
    b = oracle_pdf[cols].sort_values(list(key), kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_like=True)
