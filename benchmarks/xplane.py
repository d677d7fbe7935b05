"""Minimal, dependency-free XPlane (``*.xplane.pb``) reader.

``jax.profiler.trace`` dumps an XSpace protobuf; the canonical converters
live in tensorboard_plugin_profile, whose generated protos are pinned to a
protobuf/TF version this image doesn't carry (both the upb "Descriptors
cannot be created directly" and the ``xspace_to_tools_data`` symbol drift
bite here).  The XSpace schema itself is tiny and stable
(tsl/profiler/protobuf/xplane.proto), so we walk the wire format directly:
all we need for a device-time breakdown is

    XSpace.planes[].name                      (field 1 / 2)
    XPlane.lines[].events[].{metadata_id,duration_ps}   (3 / 4 / 1,3)
    XPlane.event_metadata{id -> name}         (field 4, map entry)

Used by benchmarks/profile_breakdown.py to report the top self-time ops of
the fused optimize step on the TPU device plane.
"""

from __future__ import annotations

import glob
import os


def _varint(buf: memoryview, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a message buffer.

    value is an int for varint/fixed wire types and a memoryview for
    length-delimited fields (submessages, strings)."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        field, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            v, i = _varint(buf, i)
        elif wt == 1:  # fixed64
            v = int.from_bytes(buf[i:i + 8], "little")
            i += 8
        elif wt == 2:  # length-delimited
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:  # fixed32
            v = int.from_bytes(buf[i:i + 4], "little")
            i += 4
        else:  # groups (3/4) never appear in xplane
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, v


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _event(buf: memoryview) -> tuple[int, int, int]:
    """XEvent -> (metadata_id, offset_ps, duration_ps)."""
    mid = off = dur = 0
    for field, _wt, v in _fields(buf):
        if field == 1:
            mid = v
        elif field == 2:
            off = v
        elif field == 3:
            dur = v
    return mid, off, dur


def _line(buf: memoryview):
    """XLine -> (name, [(metadata_id, offset_ps, duration_ps), ...])."""
    name = ""
    events = []
    for field, _wt, v in _fields(buf):
        if field == 2:
            name = bytes(v).decode("utf-8", "replace")
        elif field == 4:
            events.append(_event(v))
    return name, events


def _self_times(events) -> list[tuple[int, int]]:
    """Convert possibly-nested (mid, offset, duration) events on one track to
    (mid, self_time_ps): a parent's self time excludes any event nested
    inside its interval (the XLA Ops line carries both a `while` and the ops
    of its body)."""
    evs = sorted(events, key=lambda e: (e[1], -e[2]))
    out = []
    stack: list[list] = []  # [mid, start_ps, end_ps, child_total_ps]

    def pop():
        mid, start, end, child = stack.pop()
        dur = end - start
        out.append((mid, dur - child))
        if stack:
            stack[-1][3] += dur

    for mid, off, dur in evs:
        while stack and off >= stack[-1][2]:
            pop()
        stack.append([mid, off, off + dur, 0])
    while stack:
        pop()
    return out


def _metadata_entry(buf: memoryview) -> tuple[int, str]:
    """map<int64, XEventMetadata> entry -> (id, short op name).

    Prefers XEventMetadata.display_name (field 4, the short HLO op name);
    falls back to name (field 2), which for XLA-op events is the full HLO
    instruction text — truncated at the '=' to stay readable."""
    key = 0
    name = disp = ""
    for field, _wt, v in _fields(buf):
        if field == 1:
            key = v
        elif field == 2:  # XEventMetadata
            for f2, _w2, v2 in _fields(v):
                if f2 == 2:
                    name = bytes(v2).decode("utf-8", "replace")
                elif f2 == 4:
                    disp = bytes(v2).decode("utf-8", "replace")
    if not disp:
        disp = name.split(" = ", 1)[0].lstrip("%")
    return key, disp


def plane_line_times(path: str, plane_substr: str = "TPU"):
    """Per-line op self-time aggregation (us) over matching device planes.

    Returns {line_name: {op_name: self_time_us}}.  The 'XLA Ops' line nests
    control-flow parents over their body ops, so self time is computed by
    interval containment; 'Async XLA Ops' events (DMA overlapped with
    compute) don't nest and pass through unchanged."""
    with open(path, "rb") as f:
        space = memoryview(f.read())
    out: dict[str, dict[str, float]] = {}
    for field, _wt, plane in _fields(space):
        if field != 1:  # XSpace.planes
            continue
        name = ""
        lines = []
        meta: dict[int, str] = {}
        for f2, _w2, v2 in _fields(plane):
            if f2 == 2:
                name = bytes(v2).decode("utf-8", "replace")
            elif f2 == 3:
                lines.append(v2)  # parse lazily, only for matching planes
            elif f2 == 4:
                k, nm = _metadata_entry(v2)
                meta[k] = nm
        if plane_substr not in name:
            continue
        for lbuf in lines:
            lname, events = _line(lbuf)
            totals = out.setdefault(lname, {})
            for mid, self_ps in _self_times(events):
                op = meta.get(mid, f"op#{mid}")
                totals[op] = totals.get(op, 0.0) + self_ps / 1e6  # ps -> us
    return out


def _opcode(op: str) -> str:
    """'fusion.1234' -> 'fusion'; 'while.85' -> 'while'."""
    return op.split(".", 1)[0].split(" ", 1)[0]


def _ranked(totals: dict[str, float], k: int, detail_opcodes=()):
    total_us = sum(totals.values()) or 1.0
    rollup: dict[str, float] = {}
    for op, us in totals.items():
        rollup[_opcode(op)] = rollup.get(_opcode(op), 0.0) + us
    pct = lambda us: round(100 * us / total_us, 1)  # noqa: E731
    out = {
        "total_us": round(total_us, 1),
        "top": [{"op": op, "self_time_us": round(us, 1), "pct": pct(us)}
                for op, us in sorted(totals.items(), key=lambda kv: -kv[1])[:k]],
        "by_opcode": [{"opcode": oc, "self_time_us": round(us, 1),
                       "pct": pct(us)}
                      for oc, us in sorted(rollup.items(),
                                           key=lambda kv: -kv[1])[:k]],
    }
    if detail_opcodes:
        # name-level drill-down inside chosen opcode buckets ("copy",
        # "convert_reduce_fusion", ...) so the HLO text can be grepped for
        # the exact producers
        out["opcode_detail"] = {
            oc: [{"op": op, "self_time_us": round(us, 1), "pct": pct(us)}
                 for op, us in sorted(totals.items(), key=lambda kv: -kv[1])
                 if _opcode(op) == oc][:k]
            for oc in detail_opcodes}
    return out


def top_ops(logdir: str, k: int = 8, plane_substr: str = "TPU",
            detail_opcodes=()):
    """Device-time breakdown from the newest xplane dump under logdir.

    Returns {step_us, sync (XLA Ops line, self-time), async (DMA line,
    overlapped with compute)} — async time does NOT add to the critical
    path unless compute stalls waiting on it. ``detail_opcodes`` adds a
    per-op drill-down inside those opcode buckets."""
    dumps = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not dumps:
        return None
    lines = plane_line_times(dumps[-1], plane_substr=plane_substr)
    if not lines:
        return None
    res: dict = {}
    steps = lines.get("Steps", {})
    if steps:
        res["step_us"] = round(sum(steps.values()), 1)
    sync = lines.get("XLA Ops", {})
    if sync:
        res["sync"] = _ranked(sync, k, detail_opcodes)
    async_ = lines.get("Async XLA Ops", {})
    if async_:
        res["async"] = _ranked(async_, k)
    if not res:  # unknown line naming — aggregate everything
        allt: dict[str, float] = {}
        for t in lines.values():
            for op, us in t.items():
                allt[op] = allt.get(op, 0.0) + us
        res["all"] = _ranked(allt, k, detail_opcodes)
    return res


if __name__ == "__main__":
    import json
    import sys

    print(json.dumps(top_ops(sys.argv[1] if len(sys.argv) > 1
                             else "workdir/profile_trace"), indent=2))
