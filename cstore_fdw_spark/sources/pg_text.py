"""PostgreSQL text-format parse/render for the cstore codec's full
type surface.

The reference's type regression (``input/data_types.source`` →
``output/data_types.source``) loads six foreign tables from CSV with
``COPY … WITH CSV`` and SELECTs them back under pinned display settings
(``SET datestyle = "ISO, YMD"; SET timezone TO 'GMT';
SET intervalstyle TO 'POSTGRES_VERBOSE'``).  This module implements the
two text boundaries of that loop — the COPY *input* forms and the psql
*output* forms — for every type the corpus exercises, so
``tests/test_cstore_datatypes_corpus.py`` can reproduce the regression
end to end through the binary codec: CSV → python values →
``write_cstore_file`` → ``read_cstore_file`` → rendered cells matching
the reference's expected output verbatim.

Only public PostgreSQL behavior is encoded here (the documented
datetime/array/composite/range/bit/bytea/money/inet I/O formats).
Python-domain value representations are shared with
:mod:`cstore_format` (see ``PgInterval`` / ``PgRange`` / ``PgInet``
there).
"""

from __future__ import annotations

import datetime
import ipaddress
import uuid as uuid_mod
from decimal import Decimal

from .cstore_format import PgInet, PgInterval, PgRange

__all__ = ["parse_pg_value", "render_pg_value", "parse_pg_csv_line"]


def parse_pg_csv_line(line: str) -> list[str | None]:
    """One COPY-CSV line → fields, PG semantics: UNQUOTED empty field
    is NULL, quoted empty field is the empty string (python's csv
    module cannot make that distinction)."""
    out: list[str | None] = []
    cur: list[str] = []
    quoted = inq = False
    i = 0
    while i < len(line):
        ch = line[i]
        if inq:
            if ch == '"':
                if i + 1 < len(line) and line[i + 1] == '"':
                    cur.append('"')
                    i += 2
                    continue
                inq = False
            else:
                cur.append(ch)
        elif ch == '"':
            inq = quoted = True
        elif ch == ",":
            out.append("".join(cur) if (cur or quoted) else None)
            cur, quoted = [], False
        else:
            cur.append(ch)
        i += 1
    out.append("".join(cur) if (cur or quoted) else None)
    return out

_INF = float("inf")


# ------------------------------------------------------------------ parse

def _parse_ts(text: str) -> object:
    if text == "infinity":
        return _INF
    if text == "-infinity":
        return -_INF
    if "." in text:
        return datetime.datetime.strptime(text, "%Y-%m-%d %H:%M:%S.%f")
    return datetime.datetime.strptime(text, "%Y-%m-%d %H:%M:%S")


def _parse_tstz(text: str) -> object:
    """ISO input with a numeric zone offset (``+02`` / ``-07:30``) —
    normalized to an aware UTC datetime (the storage domain; GMT is the
    corpus display zone)."""
    if text in ("infinity", "-infinity"):
        return _parse_ts(text)
    # the zone suffix starts at the last +/- past the date part
    zone_at = max(text.rfind("+"), text.rfind("-", 10))
    if zone_at < 0:
        # zoneless input is valid COPY text under a session timezone;
        # the corpus pins TimeZone=GMT, so read it as UTC rather than
        # slicing off the last digit
        return _parse_ts(text).replace(tzinfo=datetime.timezone.utc)
    body, zone = text[:zone_at], text[zone_at:]
    parts = zone[1:].split(":")
    minutes = int(parts[0]) * 60 + (int(parts[1]) if len(parts) > 1 else 0)
    if zone[0] == "-":
        minutes = -minutes
    naive = _parse_ts(body)
    return (naive - datetime.timedelta(minutes=minutes)).replace(
        tzinfo=datetime.timezone.utc)


def _parse_date(text: str) -> object:
    if text == "infinity":
        return _INF
    if text == "-infinity":
        return -_INF
    return datetime.date.fromisoformat(text)


def _parse_time(text: str) -> datetime.time:
    if "." in text:
        return datetime.time.fromisoformat(text)
    h, m, s = text.split(":")
    return datetime.time(int(h), int(m), int(s))


def _parse_interval(text: str) -> PgInterval:
    """The corpus uses the ``HH:MM:SS`` input form; also accept the
    ``N unit`` list form (``4 hours``, ``1 mon 2 days``)."""
    text = text.strip()
    if ":" in text and not any(c.isalpha() for c in text):
        neg = text.startswith("-")
        h, m, s = (text.lstrip("-")).split(":")
        micros = (int(h) * 3600 + int(m) * 60) * 1_000_000
        micros += round(float(s) * 1_000_000)
        return PgInterval(0, 0, -micros if neg else micros)
    months = days = micros = 0
    toks = text.split()
    i = 0
    while i + 1 < len(toks) or (i < len(toks) and ":" in toks[i]):
        if ":" in toks[i]:
            micros += _parse_interval(toks[i]).micros
            i += 1
            continue
        n, unit = int(toks[i]), toks[i + 1].rstrip("s").lower()
        if unit in ("mon", "month"):
            months += n
        elif unit in ("year",):
            months += 12 * n
        elif unit in ("day",):
            days += n
        elif unit in ("hour",):
            micros += n * 3_600_000_000
        elif unit in ("min", "minute"):
            micros += n * 60_000_000
        elif unit in ("sec", "second"):
            micros += n * 1_000_000
        else:
            raise ValueError(f"interval unit {unit!r}")
        i += 2
    return PgInterval(months, days, micros)


def _split_top(body: str, quote: str = '"') -> list[str | None]:
    """Split a PG container body on top-level commas. Returns raw
    (still-quoted) element strings; empty unquoted element -> None
    marker is left to callers (array NULL vs composite NULL differ)."""
    out, cur, depth, inq, i = [], [], 0, False, 0
    while i < len(body):
        ch = body[i]
        if inq:
            if ch == quote:
                if i + 1 < len(body) and body[i + 1] == quote:
                    cur.append(quote)
                    i += 2
                    continue
                inq = False
            elif ch == "\\":
                cur.append(body[i + 1])
                i += 2
                continue
            else:
                cur.append(ch)
            i += 1
            continue
        if ch == quote:
            inq = True
            cur.append("\x00Q")  # mark "was quoted"
            i += 1
            continue
        if ch in "({[":
            depth += 1
        elif ch in ")}]":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    out.append("".join(cur))
    return out


def _unmark(tok: str) -> tuple[str, bool]:
    """(text, was_quoted) from a :func:`_split_top` token."""
    if "\x00Q" in tok:
        return tok.replace("\x00Q", ""), True
    return tok, False


def parse_pg_array(text: str, elem_parse) -> list | None:
    """``{1,2,3}`` / ``{}`` / ``{""}`` / ``{NULL}`` → python list."""
    text = text.strip()
    if not (text.startswith("{") and text.endswith("}")):
        raise ValueError(f"bad array literal {text!r}")
    body = text[1:-1]
    if body.strip() == "":
        return []
    out = []
    for tok in _split_top(body):
        val, quoted = _unmark(tok)
        if not quoted and val.strip().upper() == "NULL":
            out.append(None)
        else:
            out.append(elem_parse(val if quoted else val.strip()))
    return out


def parse_pg_composite(text: str, field_parsers) -> tuple:
    """``(2,b)`` / ``(,)`` → tuple (empty unquoted field = NULL)."""
    text = text.strip()
    if not (text.startswith("(") and text.endswith(")")):
        raise ValueError(f"bad composite literal {text!r}")
    toks = _split_top(text[1:-1])
    if len(toks) != len(field_parsers):
        raise ValueError(f"composite arity {len(toks)} != "
                         f"{len(field_parsers)}: {text!r}")
    out = []
    for tok, fp in zip(toks, field_parsers):
        val, quoted = _unmark(tok)
        out.append(fp(val) if (quoted or val != "") else None)
    return tuple(out)


def parse_pg_range(text: str, bound_parse) -> PgRange:
    text = text.strip()
    if text == "empty":
        return PgRange(None, None, False, False, True)
    lb_inc = text[0] == "["
    ub_inc = text[-1] == "]"
    toks = _split_top(text[1:-1])
    if len(toks) != 2:
        raise ValueError(f"bad range literal {text!r}")
    lo_t, lo_q = _unmark(toks[0])
    hi_t, hi_q = _unmark(toks[1])
    lower = bound_parse(lo_t) if (lo_q or lo_t != "") else None
    upper = bound_parse(hi_t) if (hi_q or hi_t != "") else None
    return PgRange(lower, upper, lb_inc and lower is not None,
                   ub_inc and upper is not None, False)


def _parse_bytea(text: str) -> bytes:
    if not text.startswith("\\x"):
        raise ValueError(f"only hex bytea input supported: {text!r}")
    return bytes.fromhex(text[2:])


def _parse_money(text: str) -> int:
    neg = text.startswith("-") or text.startswith("($")
    digits = "".join(c for c in text if c.isdigit() or c == ".")
    cents = int(round(Decimal(digits) * 100))
    return -cents if neg else cents


def _parse_inet(text: str) -> PgInet:
    if "/" in text:
        addr, bits = text.split("/")
        return PgInet(ipaddress.ip_address(addr), int(bits))
    ip = ipaddress.ip_address(text)
    return PgInet(ip, 32 if ip.version == 4 else 128)


_SCALAR_PARSE = {
    "b": lambda t: t in ("t", "true", "TRUE", "1"),
    "h": int, "i": int, "q": int,
    "f": float, "d": float,
    "date": _parse_date, "ts": _parse_ts, "tstz": _parse_tstz,
    "time": _parse_time, "iv": _parse_interval,
    "text": lambda t: t, "json": lambda t: t,
    "bytea": _parse_bytea, "money": _parse_money,
    "inet": _parse_inet, "varbit": lambda t: t,
    "uuid": uuid_mod.UUID,
}


def parse_pg_value(text: str | None, kind: str):
    """COPY-text input → the codec's python domain for ``kind`` (a
    :func:`cstore_format.cstore_type_props` kind string)."""
    if text is None:
        return None
    if kind == "num" or kind.startswith("num:"):
        return Decimal(text)
    if kind.startswith("enum:"):
        labels = kind[5:].split(",")
        if text not in labels:
            raise ValueError(f"{text!r} not in enum {labels}")
        return text
    if kind.startswith("arr:"):
        return parse_pg_array(text,
                              lambda t: parse_pg_value(t, kind[4:]))
    if kind.startswith("comp:"):
        kinds = kind[5:].split(",")
        return parse_pg_composite(
            text, [lambda t, k=k: parse_pg_value(t, k) for k in kinds])
    if kind.startswith("rng:"):
        return parse_pg_range(text,
                              lambda t: parse_pg_value(t, kind[4:]))
    return _SCALAR_PARSE[kind](text)


# ----------------------------------------------------------------- render

def _render_ts(v) -> str:
    if v == _INF:
        return "infinity"
    if v == -_INF:
        return "-infinity"
    s = v.strftime("%Y-%m-%d %H:%M:%S")
    if v.microsecond:
        s += ("%.6f" % (v.microsecond / 1e6))[1:].rstrip("0")
    return s


def _render_tstz(v) -> str:
    if isinstance(v, float):
        return _render_ts(v)
    return _render_ts(v.astimezone(datetime.timezone.utc)
                      .replace(tzinfo=None)) + "+00"


def _render_interval(v: PgInterval) -> str:
    """POSTGRES_VERBOSE output (the corpus display setting):
    ``@ 4 hours``, ``@ 0``, ``@ 1 mon 2 days 00:00:01 ago``-style
    components; zero components are omitted. Uniform-sign intervals
    only — PG renders mixed signs per-component (``@ 1 mon -1 hours``);
    rather than risk a silently-wrong rendering this raises loudly
    (the binary codec round-trips mixed signs fine; only the psql
    display form is scoped)."""
    nonzero = [x for x in (v.months, v.days, v.micros) if x]
    if any(x < 0 for x in nonzero) and any(x > 0 for x in nonzero):
        raise ValueError(
            f"interval verbose render: mixed-sign components {v!r} "
            "not supported (PG renders per-component signs)")
    parts = []
    if v.months:
        y, m = divmod(abs(v.months), 12)
        if y:
            parts.append(f"{y} year" + ("s" if y != 1 else ""))
        if m:
            parts.append(f"{m} mon" + ("s" if m != 1 else ""))
    if v.days:
        d = abs(v.days)
        parts.append(f"{d} day" + ("s" if d != 1 else ""))
    micros = abs(v.micros)
    h, rem = divmod(micros, 3_600_000_000)
    m, rem = divmod(rem, 60_000_000)
    s, us = divmod(rem, 1_000_000)
    if h:
        parts.append(f"{h} hour" + ("s" if h != 1 else ""))
    if m:
        parts.append(f"{m} min" + ("s" if m != 1 else ""))
    if s or us:
        sec = f"{s}.{us:06d}".rstrip("0").rstrip(".") if us else str(s)
        parts.append(f"{sec} sec" + ("s" if (s != 1 or us) else ""))
    if not parts:
        return "@ 0"
    neg = v.months < 0 or v.days < 0 or v.micros < 0
    return "@ " + " ".join(parts) + (" ago" if neg else "")


_ARRAY_SPECIALS = set('{},"\\ \t\n')


def _quote_if_needed(s: str, specials, force_empty=True) -> str:
    if (s == "" and force_empty) or s.upper() == "NULL" or \
            any(c in specials for c in s):
        return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'
    return s


def _render_array(vals: list, elemkind: str) -> str:
    items = []
    for v in vals:
        if v is None:
            items.append("NULL")
        else:
            items.append(_quote_if_needed(
                render_pg_value(v, elemkind), _ARRAY_SPECIALS))
    return "{" + ",".join(items) + "}"


_COMP_SPECIALS = set('(),"\\ \t\n')


def _render_composite(vals: tuple, kinds: list[str]) -> str:
    items = []
    for v, k in zip(vals, kinds):
        if v is None:
            items.append("")
        else:
            items.append(_quote_if_needed(
                render_pg_value(v, k), _COMP_SPECIALS))
    return "(" + ",".join(items) + ")"


def _render_range(v: PgRange, subkind: str) -> str:
    if v.empty:
        return "empty"
    def bound(b):
        if b is None:
            return ""
        return _quote_if_needed(render_pg_value(b, subkind),
                                _COMP_SPECIALS.union("[]"),
                                force_empty=True)
    return ((("[" if v.lower_inc else "(") + bound(v.lower) + "," +
             bound(v.upper) + ("]" if v.upper_inc else ")")))


def _render_money(cents: int) -> str:
    sign = "-" if cents < 0 else ""
    whole, frac = divmod(abs(cents), 100)
    return f"{sign}${whole:,}.{frac:02d}"


def _render_inet(v: PgInet) -> str:
    full = 32 if v.addr.version == 4 else 128
    return str(v.addr) if v.bits == full else f"{v.addr}/{v.bits}"


def _render_num(d: Decimal) -> str:
    # psql prints numerics as plain digits, never scientific notation:
    # Decimal('1E+2') must render '100', not '1E+2'
    if d.as_tuple().exponent >= 0:
        return f"{d:f}"
    return str(d)


_SCALAR_RENDER = {
    "b": lambda v: "t" if v else "f",
    "h": str, "i": str, "q": str,
    "f": lambda v: repr(v), "d": lambda v: repr(v),
    "date": lambda v: ("infinity" if v == _INF else "-infinity"
                       if v == -_INF else v.isoformat()),
    "ts": _render_ts, "tstz": _render_tstz,
    "time": lambda v: v.strftime("%H:%M:%S") +
        (("%.6f" % (v.microsecond / 1e6))[1:].rstrip("0")
         if v.microsecond else ""),
    "iv": _render_interval,
    "text": lambda v: v, "json": lambda v: v,
    "bytea": lambda v: "\\x" + v.hex(),
    "money": _render_money, "inet": _render_inet,
    "varbit": lambda v: v,
    "uuid": str,
}


def render_pg_value(value, kind: str) -> str | None:
    """Codec python domain → the psql display form under the corpus
    settings (ISO/YMD dates, GMT, verbose intervals). NULL → None
    (psql shows an empty cell)."""
    if value is None:
        return None
    if kind == "num" or kind.startswith("num:"):
        return _render_num(value)
    if kind.startswith("enum:"):
        return value
    if kind.startswith("arr:"):
        return _render_array(value, kind[4:])
    if kind.startswith("comp:"):
        return _render_composite(value, kind[5:].split(","))
    if kind.startswith("rng:"):
        return _render_range(value, kind[4:])
    return _SCALAR_RENDER[kind](value)
