"""Minimal HOCON parser + typed config tree.

The reference framework configures everything through pyhocon HOCON files with
``include required("...")`` inheritance (see /root/reference/conf/default_mv.conf:2 and
src/util/args.py:9-112).  pyhocon is not available in this environment, so this module
implements the HOCON subset those config files actually use:

  * ``#`` and ``//`` comments (inline or full-line)
  * ``include required("path")`` / ``include "path"`` (paths relative to including file)
  * nested object blocks ``key { ... }`` and ``key = { ... }``
  * ``key = value`` / ``key : value``
  * scalar values: bool (true/True/false/False), int, float (incl. 1e-4), strings
    (bare or quoted)
  * lists ``[a, b, c]`` (possibly spanning multiple lines) and the empty list ``[]``
  * object merge semantics: re-opening a block deep-merges, scalar assignment overrides

The resulting :class:`ConfigTree` mirrors pyhocon's typed-getter API
(``get_bool/get_int/get_float/get_string/get_list``, dotted paths, ``__getitem__``
returning subtrees) so every ``from_conf`` constructor in the framework reads configs
exactly the way the reference modules do (e.g. src/render/nerf.py:340-352).
"""

from __future__ import annotations

import os
import re
from typing import Any, Iterator, List, Optional, Tuple

__all__ = ["ConfigTree", "parse_file", "parse_string", "from_dict"]

_MISSING = object()


class ConfigTree:
    """Nested, dotted-path-addressable config mapping with typed getters."""

    def __init__(self, data: Optional[dict] = None):
        self._data: dict = {}
        if data:
            for k, v in data.items():
                self._data[k] = ConfigTree(v) if isinstance(v, dict) else v

    # ---- core access -------------------------------------------------------------
    def _resolve(self, path: str) -> Tuple[Optional["ConfigTree"], str]:
        """Walk dotted path; returns (parent_tree_or_None, leaf_key)."""
        parts = path.split(".")
        node: Any = self
        for p in parts[:-1]:
            if not isinstance(node, ConfigTree) or p not in node._data:
                return None, parts[-1]
            node = node._data[p]
        if not isinstance(node, ConfigTree):
            return None, parts[-1]
        return node, parts[-1]

    def get(self, path: str, default: Any = None) -> Any:
        node, leaf = self._resolve(path)
        if node is None or leaf not in node._data:
            return default
        return node._data[leaf]

    def put(self, path: str, value: Any) -> None:
        parts = path.split(".")
        node = self
        for p in parts[:-1]:
            child = node._data.get(p)
            if not isinstance(child, ConfigTree):
                child = ConfigTree()
                node._data[p] = child
            node = child
        node._data[parts[-1]] = value

    def __getitem__(self, path: str) -> Any:
        val = self.get(path, _MISSING)
        if val is _MISSING:
            raise KeyError(path)
        return val

    def __contains__(self, path: str) -> bool:
        return self.get(path, _MISSING) is not _MISSING

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    def __len__(self) -> int:
        return len(self._data)

    def __repr__(self) -> str:
        return f"ConfigTree({self.as_dict()!r})"

    def __eq__(self, other) -> bool:
        if isinstance(other, ConfigTree):
            return self.as_dict() == other.as_dict()
        if isinstance(other, dict):
            return self.as_dict() == other
        return NotImplemented

    def as_dict(self) -> dict:
        return {
            k: (v.as_dict() if isinstance(v, ConfigTree) else v)
            for k, v in self._data.items()
        }

    # ---- typed getters (pyhocon-compatible surface) -------------------------------
    def get_string(self, path: str, default: Any = _MISSING) -> str:
        val = self._typed(path, default)
        return val if val is None else str(val)

    def get_bool(self, path: str, default: Any = _MISSING) -> bool:
        val = self._typed(path, default)
        if isinstance(val, str):
            low = val.lower()
            if low in ("true", "yes", "on"):
                return True
            if low in ("false", "no", "off"):
                return False
            raise ValueError(f"Cannot interpret {val!r} at {path!r} as bool")
        return bool(val) if val is not None else val

    def get_int(self, path: str, default: Any = _MISSING) -> int:
        val = self._typed(path, default)
        return val if val is None else int(val)

    def get_float(self, path: str, default: Any = _MISSING) -> float:
        val = self._typed(path, default)
        if isinstance(val, bool):
            # The reference reads bool `white_bkgd` through get_float
            # (src/render/nerf.py:348); mirror pyhocon's coercion.
            return float(val)
        return val if val is None else float(val)

    def get_list(self, path: str, default: Any = _MISSING) -> Optional[list]:
        val = self._typed(path, default)
        if val is None or isinstance(val, list):
            return val
        raise ValueError(f"Value at {path!r} is not a list: {val!r}")

    def get_config(self, path: str, default: Any = _MISSING) -> "ConfigTree":
        val = self._typed(path, default)
        if val is None or isinstance(val, ConfigTree):
            return val
        raise ValueError(f"Value at {path!r} is not a config tree")

    def _typed(self, path: str, default: Any) -> Any:
        val = self.get(path, _MISSING)
        if val is _MISSING:
            if default is _MISSING:
                raise KeyError(f"No configuration setting found for key {path!r}")
            return default
        return val

    # ---- merge --------------------------------------------------------------------
    def merge(self, other: "ConfigTree") -> None:
        """Deep-merge ``other`` into self (other's leaves win)."""
        for k, v in other._data.items():
            if isinstance(v, ConfigTree) and isinstance(self._data.get(k), ConfigTree):
                self._data[k].merge(v)
            else:
                self._data[k] = v.copy() if isinstance(v, ConfigTree) else v

    def copy(self) -> "ConfigTree":
        out = ConfigTree()
        for k, v in self._data.items():
            out._data[k] = v.copy() if isinstance(v, ConfigTree) else v
        return out


def from_dict(d: dict) -> ConfigTree:
    return ConfigTree(d)


# ======================== tokenizer / parser ========================

_INCLUDE_RE = re.compile(
    r"""^include\s+(?:required\s*\(\s*)?["']([^"']+)["']\s*\)?\s*$"""
)


def _strip_comment(line: str) -> str:
    """Remove # / // comments, respecting quoted strings."""
    out = []
    in_str: Optional[str] = None
    i = 0
    while i < len(line):
        ch = line[i]
        if in_str:
            out.append(ch)
            if ch == in_str:
                in_str = None
            i += 1
            continue
        if ch in "\"'":
            in_str = ch
            out.append(ch)
            i += 1
            continue
        if ch == "#":
            break
        if ch == "/" and i + 1 < len(line) and line[i + 1] == "/":
            break
        out.append(ch)
        i += 1
    return "".join(out)


def _parse_scalar(tok: str) -> Any:
    tok = tok.strip()
    if len(tok) >= 2 and tok[0] in "\"'" and tok[-1] == tok[0]:
        return tok[1:-1]
    low = tok.lower()
    if low in ("true", "yes", "on"):
        return True
    if low in ("false", "no", "off"):
        return False
    if low in ("null", "none"):
        return None
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        pass
    return tok


def _split_list_items(body: str) -> List[str]:
    items, depth, cur = [], 0, []
    for ch in body:
        if ch == "[":
            depth += 1
            cur.append(ch)
        elif ch == "]":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            items.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur and "".join(cur).strip():
        items.append("".join(cur))
    return [s.strip() for s in items if s.strip()]


def _parse_value(text: str) -> Any:
    text = text.strip()
    if text.startswith("["):
        assert text.endswith("]"), f"Unterminated list: {text!r}"
        body = text[1:-1].strip()
        if not body:
            return []
        return [_parse_value(item) for item in _split_list_items(body)]
    return _parse_scalar(text)


def _split_statements(text: str) -> List[str]:
    """Split `a = 1, b = 2` style same-line statements on top-level commas
    (commas inside [] are list separators, not statement separators)."""
    parts, depth, cur = [], 0, []
    for ch in text:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


class _Parser:
    def __init__(self, lines: List[str], base_dir: str):
        self.lines = lines
        self.pos = 0
        self.base_dir = base_dir

    def _next_logical_line(self) -> Optional[str]:
        """Return next non-empty comment-stripped line, joining multi-line lists."""
        while self.pos < len(self.lines):
            line = _strip_comment(self.lines[self.pos]).strip()
            self.pos += 1
            if not line:
                continue
            # Join continuation lines while brackets are unbalanced.
            while line.count("[") > line.count("]") and self.pos < len(self.lines):
                nxt = _strip_comment(self.lines[self.pos]).strip()
                self.pos += 1
                line += " " + nxt
            return line
        return None

    def parse_block(self, tree: ConfigTree, top_level: bool) -> None:
        while True:
            line = self._next_logical_line()
            if line is None:
                if not top_level:
                    raise ValueError("Unexpected end of file inside block")
                return
            if line.replace("}", "").strip() == "" and "}" in line:
                # one or more closing braces; requeue the extras
                n_close = line.count("}")
                for _ in range(n_close - 1):
                    self.lines.insert(self.pos, "}")
                if top_level:
                    raise ValueError("Unbalanced '}'")
                return

            m = _INCLUDE_RE.match(line)
            if m:
                inc_path = m.group(1)
                if not os.path.isabs(inc_path):
                    inc_path = os.path.join(self.base_dir, inc_path)
                tree.merge(parse_file(inc_path))
                continue

            # `key {` opens a nested block; any same-line remainder (statements,
            # closing braces) is split and re-queued ahead of the block body.
            open_m = re.match(r"^([\w.\-]+)\s*(?:[=:]\s*)?\{\s*(.*)$", line)
            if open_m:
                key, rest = open_m.group(1), open_m.group(2).strip()
                sub = tree.get(key)
                if not isinstance(sub, ConfigTree):
                    sub = ConfigTree()
                    tree.put(key, sub)
                if rest:
                    for stmt in reversed(_split_statements(rest)):
                        self.lines.insert(self.pos, stmt)
                self.parse_block(sub, top_level=False)
                continue

            # Plain assignment, possibly with trailing block-closers `b = 2 } }`.
            kv_m = re.match(r"^([\w.\-]+)\s*[=:]\s*(.+?)((?:\s*\})*)\s*$", line)
            if kv_m:
                key, raw, closers = (
                    kv_m.group(1),
                    kv_m.group(2).strip(),
                    kv_m.group(3),
                )
                tree.put(key, _parse_value(raw))
                for _ in range(closers.count("}")):
                    self.lines.insert(self.pos, "}")
                continue

            raise ValueError(f"Cannot parse config line: {line!r}")


def parse_string(text: str, base_dir: str = ".") -> ConfigTree:
    tree = ConfigTree()
    _Parser(text.splitlines(), base_dir).parse_block(tree, top_level=True)
    return tree


def parse_file(path: str) -> ConfigTree:
    with open(path, "r") as f:
        text = f.read()
    return parse_string(text, base_dir=os.path.dirname(os.path.abspath(path)))
