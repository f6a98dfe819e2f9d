"""Config-file loading (SURVEY.md §3.1 — the reference resolves its
topology from a Typesafe ``application.conf`` via
``ConfigFactory.parseResources``, CustomerSpendingAnalysis.scala:196-
210 / conf:1-10; this is the argparse-era loader half).

Supports the HOCON *subset* the reference's 10-line conf actually
uses — nested ``section { ... }`` blocks, ``key = value`` /
``key: value``, quoted or bare values, ``#`` and ``//`` comments —
flattened to dotted keys (``db.url``, ``kafka.bootstrap.servers``),
plus plain JSON files (nested objects flatten the same way).  Not a
full HOCON engine (no includes/substitutions — the reference uses
neither).

Precedence (``resolve``): explicit CLI args > config file > built-in
defaults — the conventional ops layering the reference lacks (its
conf values are compile-time fixed).
"""

from __future__ import annotations

import json
from collections.abc import Mapping
from pathlib import Path


def _flatten(obj: Mapping, prefix: str = "") -> dict[str, str]:
    out: dict[str, str] = {}
    for key, val in obj.items():
        dotted = f"{prefix}{key}"
        if isinstance(val, Mapping):
            out.update(_flatten(val, f"{dotted}."))
        else:
            out[dotted] = str(val)
    return out


def _strip_comment(line: str) -> str:
    # comments start at # or // outside quotes
    in_quote = False
    i = 0
    while i < len(line):
        ch = line[i]
        if ch == '"':
            in_quote = not in_quote
        elif not in_quote and (
            ch == "#" or line[i : i + 2] == "//"
        ):
            return line[:i]
        i += 1
    return line


def _unquote(value: str) -> str:
    value = value.strip()
    if len(value) >= 2 and value[0] == value[-1] == '"':
        return value[1:-1]
    return value


def parse_hocon_subset(text: str) -> dict[str, str]:
    """Flat dotted-key dict from the HOCON subset described above."""
    out: dict[str, str] = {}
    stack: list[str] = []
    for raw in text.splitlines():
        line = _strip_comment(raw).strip()
        if not line:
            continue
        if line.endswith("{"):
            section = line[:-1].strip().rstrip(":=").strip()
            if not section:
                raise ValueError(f"anonymous block in config: {raw!r}")
            stack.append(_unquote(section))
            continue
        if line == "}":
            if not stack:
                raise ValueError("unbalanced '}' in config")
            stack.pop()
            continue
        for sep in ("=", ":"):
            if sep in line:
                key, _, value = line.partition(sep)
                dotted = ".".join([*stack, _unquote(key.strip())])
                out[dotted] = _unquote(value)
                break
        else:
            raise ValueError(f"unparseable config line: {raw!r}")
    if stack:
        raise ValueError(f"unclosed block(s) in config: {stack}")
    return out


def load_config(path: str | Path) -> dict[str, str]:
    """Flat dotted-key config from a ``.json`` or ``.conf`` file."""
    path = Path(path)
    text = path.read_text()
    if path.suffix == ".json":
        return _flatten(json.loads(text))
    return parse_hocon_subset(text)


def resolve(
    defaults: Mapping[str, str],
    file_config: Mapping[str, str] | None = None,
    overrides: Mapping[str, str] | None = None,
) -> dict[str, str]:
    """Layer configs: ``overrides`` (CLI) beat ``file_config`` beat
    ``defaults``.  Keys outside ``defaults`` are rejected — a typo'd
    config key should fail loudly, not silently do nothing."""
    merged = dict(defaults)
    for layer in (file_config or {}, overrides or {}):
        for key, val in layer.items():
            if key not in defaults:
                raise KeyError(
                    f"unknown config key {key!r}; expected one of "
                    f"{sorted(defaults)}"
                )
            merged[key] = val
    return merged
