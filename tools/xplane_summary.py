"""Summarize a jax.profiler xplane.pb: top device ops by total duration.

Zero-dependency XPlane reader (the tensorboard profile plugin is not in
this image): a minimal protobuf wire-format walker over the XSpace
message (tensorflow/core/profiler/protobuf/xplane.proto).

Usage: python tools/xplane_summary.py <trace.xplane.pb> [top_n]
"""
from __future__ import annotations

import collections
import sys


def _varint(buf: memoryview, i: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over one message."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _varint(buf, i)
        fnum, wt = key >> 3, key & 7
        if wt == 0:
            val, i = _varint(buf, i)
        elif wt == 2:
            ln, i = _varint(buf, i)
            val = buf[i:i + ln]
            i += ln
        elif wt == 5:
            val = bytes(buf[i:i + 4])
            i += 4
        elif wt == 1:
            val = bytes(buf[i:i + 8])
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fnum, wt, val


def summarize(path: str, top_n: int = 30) -> list[tuple[str, float, int]]:
    with open(path, "rb") as f:
        space = memoryview(f.read())

    results = []
    for fnum, _, plane_buf in _fields(space):
        if fnum != 1:
            continue
        name = ""
        meta: dict[int, str] = {}
        lines = []
        for pf, _, pv in _fields(plane_buf):
            if pf == 2:
                name = bytes(pv).decode()
            elif pf == 3:
                lines.append(pv)
            elif pf == 4:  # map<int64, XEventMetadata>
                mid, mname = None, ""
                for ef, _, ev in _fields(pv):
                    if ef == 1:
                        mid = ev
                    elif ef == 2:
                        for mf, _, mv in _fields(ev):
                            if mf == 1:
                                mid = mv
                            elif mf == 2:
                                mname = bytes(mv).decode()
                if mid is not None:
                    meta[mid] = mname
        if "TPU" not in name and "Device" not in name:
            continue
        durs: dict[str, list] = collections.defaultdict(lambda: [0.0, 0])
        for line_buf in lines:
            lname = ""
            events = []
            for lf, _, lv in _fields(line_buf):
                if lf == 2:
                    lname = bytes(lv).decode()
                elif lf == 4:
                    events.append(lv)
            # All device lines are aggregated; the line name prefixes each
            # entry so module/step aggregates ("XLA Modules::", "Steps::")
            # are distinguishable from individual "XLA Ops::" rows.
            for ev_buf in events:
                mid = dur = 0
                for ef, wt, ev in _fields(ev_buf):
                    if ef == 1:
                        mid = ev
                    elif ef == 3 and wt == 0:
                        dur = ev
                key = f"{lname}::{meta.get(mid, mid)}"
                d = durs[key]
                d[0] += dur / 1e9  # ps → ms
                d[1] += 1
        for k, (ms, cnt) in durs.items():
            results.append((f"{name}::{k}", ms, cnt))

    results.sort(key=lambda r: -r[1])
    return results[:top_n]


if __name__ == "__main__":
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    for name, ms, cnt in summarize(path, top_n):
        print(f"{ms:10.2f} ms  x{cnt:<6d} {name}")
