"""BrainVISA ``.arg`` sulcal graph reader (text graph + ``.data`` buckets).

Native replacement for ``aims.read(gfile)`` on CorticalFoldArg graphs
(ref pattern_class.py:123, dataset.py:51).  The ``.arg`` format is a text
tree:

    # graph 1.0
    *BEGIN GRAPH CorticalFoldArg
    <key> <value...>                      graph attributes
    *BEGIN NODE fold <id>
    <key> <value...>                      vertex attributes
    *END
    *BEGIN UV <syntax> <id1> <id2>        edges (ignored: the reference
    *END                                   reads only vertices)
    *END

with bucket voxel data in a companion ``<base>.data/`` directory.  Two
storage modes are handled:

* **global** — graph attr ``type.global.bck`` names per-bucket files
  (``aims_ss.global.bck`` ...); each vertex holds an integer
  ``<prefix>_label`` selecting that vertex's time-slice in the global
  bucket file;
* **local** — the vertex attribute value itself names a per-vertex ``.bck``
  file inside the ``.data`` dir.

``.bck`` container layout (AIMS BckHeader convention): mode string
("binar"/"ascii"), byte-order magic 'ABCD', length-prefixed item type
("VOID" for plain voxel sets), voxel size (4 float32), time count, then per
time: (time:u32, npoints:u32, npoints x 3 coords).  Coordinate width is
auto-detected (int16 AimsVector Point3d vs int32) by checking the file
length arithmetic — real-world BrainVISA files ship both vintages.
Validated by round-trip against :mod:`unetsulc_tpu.io.arg_writer`; exotic
AIMS variants that deviate fail loudly rather than mis-parse.

Attributes used downstream (ref dataset.py:177-200): ``voxel_size``,
``Talairach_rotation/translation/scale``, per-vertex ``name``/``index``.
"""

from __future__ import annotations

import os
import os.path as op
import re
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from unetsulc_tpu.io.graph import (
    BUCKET_TYPES,
    SulcalGraph,
    TalairachTransform,
    Vertex,
)

_BUCKET_LABEL_KEYS = {
    "aims_ss": "ss_label",
    "aims_bottom": "bottom_label",
    "aims_other": "other_label",
}


def _parse_value(raw: str):
    raw = raw.strip()
    tokens = raw.split()
    if not tokens:
        return raw
    if len(tokens) == 1:
        for cast in (int, float):
            try:
                return cast(tokens[0])
            except ValueError:
                pass
        return tokens[0]
    try:
        nums = [float(t) for t in tokens]
        if all(float(int(n)) == n for n in nums):
            return [int(n) for n in nums]
        return nums
    except ValueError:
        return raw


def _parse_tree(text: str):
    """Parse the *BEGIN/*END structure into (graph_attrs, node_list)."""
    graph_attrs: Dict[str, object] = {}
    nodes: List[Dict[str, object]] = []
    stack: List[Tuple[str, Dict[str, object]]] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if line.startswith("*BEGIN"):
            parts = line.split()
            kind = parts[1] if len(parts) > 1 else ""
            attrs: Dict[str, object] = {}
            if kind == "NODE" and len(parts) > 3:
                attrs["__id__"] = parts[3]
            stack.append((kind, attrs))
            continue
        if line.startswith("*END"):
            if not stack:
                continue
            kind, attrs = stack.pop()
            if kind == "GRAPH":
                graph_attrs.update(attrs)
            elif kind == "NODE":
                nodes.append(attrs)
            # UV (edges) and other sections are dropped: the pipeline only
            # consumes vertices (ref dataset.py:180)
            continue
        m = re.match(r"(\S+)[ \t]+(.*)$", line)
        if not m:
            continue
        key, raw = m.group(1), m.group(2)
        target = stack[-1][1] if stack else graph_attrs
        target[key] = _parse_value(raw)
    return graph_attrs, nodes


# --------------------------------------------------------------------------
# .bck bucket files
# --------------------------------------------------------------------------


def read_bck(path: str) -> Dict[int, np.ndarray]:
    """Read a bucket file -> {time: (n, 3) int32 coords}."""
    with open(path, "rb") as f:
        head = f.read(5)
        if head == b"binar":
            return _read_bck_binary(f.read())
        if head == b"ascii":
            return _read_bck_ascii(f.read().decode("latin1"))
    raise ValueError(f"{path}: not a .bck bucket file")


def _read_bck_binary(buf: bytes) -> Dict[int, np.ndarray]:
    (bo,) = struct.unpack("<I", buf[:4])
    if bo == 0x41424344:
        end = "<"
    elif bo == 0x44434241:
        end = ">"
    else:
        raise ValueError("bad .bck byte-order magic")
    off = 4
    (tlen,) = struct.unpack(end + "I", buf[off : off + 4])
    off += 4
    item_type = buf[off : off + tlen].decode()
    off += tlen
    if item_type != "VOID":
        raise ValueError(f"unsupported .bck item type: {item_type}")
    off += 16  # voxel size: 4 x float32 (unused downstream)
    (dimt,) = struct.unpack(end + "I", buf[off : off + 4])
    off += 4

    for coord in ("h", "i"):  # int16 Point3d first, then int32
        out = {}
        pos = off
        ok = True
        csize = struct.calcsize(coord)
        for _ in range(dimt):
            if pos + 8 > len(buf):
                ok = False
                break
            t, n = struct.unpack(end + "II", buf[pos : pos + 8])
            pos += 8
            nbytes = n * 3 * csize
            if pos + nbytes > len(buf):
                ok = False
                break
            pts = np.frombuffer(
                buf, dtype=np.dtype(end + coord), count=n * 3, offset=pos
            ).reshape(n, 3)
            out[int(t)] = pts.astype(np.int32)
            pos += nbytes
        if ok and pos == len(buf):
            return out
    raise ValueError("could not parse .bck payload (unknown coord width)")


def _read_bck_ascii(text: str) -> Dict[int, np.ndarray]:
    tokens = re.findall(r"[-\w.()+,]+", text)
    it = iter(tokens)
    item_type = next(it)
    if item_type != "VOID":
        raise ValueError(f"unsupported .bck item type: {item_type}")
    next(it), next(it), next(it), next(it)  # voxel size (4 floats)
    dimt = int(next(it))
    out = {}
    for _ in range(dimt):
        t = int(next(it))
        n = int(next(it))
        pts = np.zeros((n, 3), np.int32)
        for i in range(n):
            tok = next(it)
            if tok.startswith("("):
                vals = tok.strip("()").split(",")
                if len(vals) < 3:
                    vals += [next(it).strip("(),") for _ in range(3 - len(vals))]
            else:
                vals = [tok, next(it).strip("(),"), next(it).strip("(),")]
            pts[i] = [int(float(v.strip("(),"))) for v in vals]
        out[t] = pts
    return out


# --------------------------------------------------------------------------
# graph assembly
# --------------------------------------------------------------------------


def _talairach_from_attrs(attrs: dict) -> TalairachTransform:
    rot = attrs.get("Talairach_rotation")
    trl = attrs.get("Talairach_translation")
    scl = attrs.get("Talairach_scale")
    if rot is None or trl is None:
        return TalairachTransform.identity()
    return TalairachTransform(
        rotation=np.asarray(rot, np.float64).reshape(3, 3),
        translation=np.asarray(trl, np.float64),
        scale=np.asarray(scl, np.float64) if scl is not None else None,
    )


def load_graph_arg(path: str) -> SulcalGraph:
    with open(path, "r", encoding="latin1") as f:
        graph_attrs, nodes = _parse_tree(f.read())

    base = graph_attrs.get("filename_base", "*")
    if base == "*" or base is None:
        data_dir = op.splitext(path)[0] + ".data"
    else:
        data_dir = op.join(op.dirname(path), str(base))

    # global bucket files, loaded lazily once each
    global_buckets: Dict[str, Dict[int, np.ndarray]] = {}

    def global_bucket(bt: str) -> Optional[Dict[int, np.ndarray]]:
        if bt not in global_buckets:
            fname = graph_attrs.get(f"{bt}.global.bck")
            if isinstance(fname, str) and op.exists(op.join(data_dir, fname)):
                global_buckets[bt] = read_bck(op.join(data_dir, fname))
            elif op.exists(op.join(data_dir, f"{bt}.global.bck")):
                global_buckets[bt] = read_bck(
                    op.join(data_dir, f"{bt}.global.bck")
                )
            else:
                global_buckets[bt] = None
        return global_buckets[bt]

    vertices = []
    for attrs in nodes:
        index = int(attrs.get("index", attrs.get("__id__", 0)))
        name = attrs.get("name")
        buckets = {}
        for bt in BUCKET_TYPES:
            pts = None
            val = attrs.get(bt)
            if isinstance(val, str) and val:
                # local mode: attribute names a per-vertex bucket file
                cand = val if val.endswith(".bck") else val + ".bck"
                fpath = op.join(data_dir, cand)
                if op.exists(fpath):
                    sub = read_bck(fpath)
                    if sub:
                        pts = np.concatenate(list(sub.values()))
            if pts is None:
                gb = global_bucket(bt)
                label_key = _BUCKET_LABEL_KEYS[bt]
                if gb is not None and label_key in attrs:
                    pts = gb.get(int(attrs[label_key]))
            if pts is not None and len(pts):
                buckets[bt] = np.asarray(pts, np.int32)
        vertices.append(
            Vertex(index=index, name=str(name) if name is not None else None,
                   buckets=buckets)
        )

    vs = graph_attrs.get("voxel_size", [1.0, 1.0, 1.0])
    if isinstance(vs, (int, float)):
        vs = [vs, vs, vs]
    return SulcalGraph(
        voxel_size=tuple(float(v) for v in vs[:3]),
        vertices=vertices,
        talairach=_talairach_from_attrs(graph_attrs),
        attributes={
            k: v for k, v in graph_attrs.items() if not k.startswith("__")
        },
    )
