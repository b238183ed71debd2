"""Hierarchical properties: the 'return value' of every algorithm.

Port of gatb-core IProperties/Properties (tools/misc/api/IProperty.hpp,
impl/Property.cpp): keys with depths, add/get, XML and raw dump visitors,
and the key-by-key comparison used by dbgh5's -check non-regression harness
(tools/dbgh5.cpp:145-190).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class Properties:
    entries: list = field(default_factory=list)  # (depth, key, value)

    def add(self, depth: int, key: str, value=None) -> None:
        if isinstance(value, Properties):
            self.entries.append((depth, key, None))
            for d, k2, v2 in value.entries:
                self.entries.append((depth + d + 1, k2, v2))
        else:
            self.entries.append(
                (depth, key, None if value is None else str(value)))

    def get(self, key: str, default=None):
        for _, k, v in self.entries:
            if k == key:
                return v
        return default

    def update(self, mapping: dict, depth: int = 1) -> None:
        for k, v in mapping.items():
            self.add(depth, k, v)

    def dump_raw(self) -> str:
        lines = []
        for depth, key, value in self.entries:
            pad = "    " * depth
            val = "" if value is None else f" : {value}"
            lines.append(f"{pad}{key}{val}")
        return "\n".join(lines)

    def dump_xml(self) -> str:
        out = ["<properties>"]
        for depth, key, value in self.entries:
            pad = "  " * (depth + 1)
            if value is None:
                out.append(f"{pad}<{key}/>")
            else:
                out.append(f"{pad}<{key}>{value}</{key}>")
        out.append("</properties>")
        return "\n".join(out)

    def as_flat_dict(self) -> dict:
        return {k: v for _, k, v in self.entries if v is not None}

    @staticmethod
    def load_props_file(path: str) -> dict:
        """Parse a reference-style .props file: 'key value' per line."""
        out = {}
        with open(path) as f:
            for line in f:
                parts = line.strip().split(None, 1)
                if len(parts) == 2:
                    out[parts[0]] = parts[1]
        return out

    def check_against(self, expected: dict) -> list[str]:
        """dbgh5-style key-by-key diff; returns list of mismatch messages."""
        got = self.as_flat_dict()
        errors = []
        for key, val in expected.items():
            if key not in got:
                errors.append(f"missing key '{key}'")
            elif str(got[key]) != str(val):
                errors.append(
                    f"key '{key}': got '{got[key]}', expected '{val}'")
        return errors
