"""Result-comparison helpers shared by pytest and tools/check_correctness.

Mirrors the driver's compare: columns sorted by name, rows sorted by all
columns, exact match for non-floats, exact-or-reported-diff for floats
(the inventory casts float SUMs through DECIMAL so exactness is expected;
see de_polars_spark/inventory/__init__.py determinism rules).
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd


class NonScalarOutputError(TypeError):
    """An inventory query produced a list/array output column.

    The driver's canonicalizer does a raw pandas sort over cells and dies
    with ``unhashable type: 'list'`` on array columns (r4: inverted_index
    was the only red row for exactly this).  The local gate must REJECT
    such columns rather than silently stringify them — otherwise "green
    locally" can still be red at the driver.  Serialize arrays at the
    query edge (``F.array_join`` / ``array_to_string``) instead.
    """


def _canon_cell(v):
    """Stringify a scalar cell; reject containers (driver-gate mirror)."""
    if v is None:
        return None
    if not isinstance(v, (str, bytes)) and hasattr(v, "tolist"):
        v = v.tolist()
    if isinstance(v, (list, tuple, dict, set)):
        raise NonScalarOutputError(
            f"non-scalar output cell {v!r}: the driver cannot hash "
            "array/map columns — serialize at the query edge"
        )
    return str(v)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].map(_canon_cell)
    return df.sort_values(by=list(df.columns), ignore_index=True, na_position="last")


def _render_cell(v, is_float: bool) -> str:
    """Render a cell the way a strict byte-hash sees it: dtype-visible.

    ``123`` (int64) and ``123.0`` (float64) must render differently — the
    tolerance-based column compare treats them as equal, but the driver's
    hash gate does not (r1: scalar_functions_showcase, finops_tag_compliance;
    r2: dedup_simhash_hamming all slipped through the value compare and
    failed the driver hash on exactly this class of drift).
    """
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "\x00"
    if is_float:
        return repr(float(v))
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return repr(int(v))
    return str(v)


def value_hash(df: pd.DataFrame) -> str:
    """Strict byte-level hash of the normalized frame (driver-gate mirror)."""
    n = normalize(df)
    h = hashlib.sha256()
    h.update(("|".join(map(str, n.columns))).encode())
    for c in n.columns:
        col = n[c]
        is_float = pd.api.types.is_float_dtype(col)
        is_int = pd.api.types.is_integer_dtype(col)
        for v in col:
            if pd.isna(v) if (is_float or is_int) else False:
                h.update(b"\x00\x1f")
                continue
            if is_int:
                h.update(repr(int(v)).encode())
            else:
                h.update(_render_cell(v, is_float).encode())
            h.update(b"\x1f")
        h.update(b"\x1e")
    return h.hexdigest()


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = results identical)."""
    problems: list[str] = []
    s, o = normalize(spark_df), normalize(oracle_df)
    if list(s.columns) != list(o.columns):
        return [f"columns differ: spark={list(s.columns)} oracle={list(o.columns)}"]
    if len(s) != len(o):
        return [f"row count differs: spark={len(s)} oracle={len(o)}"]
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            sv = pd.to_numeric(sv, errors="coerce").astype(float)
            ov = pd.to_numeric(ov, errors="coerce").astype(float)
            both_nan = sv.isna() & ov.isna()
            diff = (sv - ov).abs()
            bad = ~both_nan & ~(diff == 0)
            if bad.any():
                md = diff[bad].max()
                problems.append(
                    f"col {c}: {int(bad.sum())}/{len(sv)} rows differ, "
                    f"max_abs_diff={md!r}"
                    + (" (incl. NaN-vs-value)" if math.isnan(md) else "")
                )
        else:
            eq = (sv == ov) | (sv.isna() & ov.isna())
            if not eq.all():
                i = (~eq).idxmax()
                problems.append(
                    f"col {c}: {int((~eq).sum())}/{len(sv)} rows differ "
                    f"(e.g. row {i}: spark={sv[i]!r} oracle={ov[i]!r})"
                )
    if not problems:
        hs, ho = value_hash(spark_df), value_hash(oracle_df)
        if hs != ho:
            dt = {
                c: (str(s[c].dtype), str(o[c].dtype))
                for c in s.columns
                if str(s[c].dtype) != str(o[c].dtype)
            }
            problems.append(
                f"strict hash differs (values equal under tolerance): "
                f"dtype drift {dt or 'none — rendering drift'}"
            )
    return problems
