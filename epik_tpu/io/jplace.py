"""Streaming jplace v3 writer, byte-compatible with the reference output.

Re-implements the reference's rapidjson-based streaming writer
(reference: epik/src/epik/jplace.cpp):

* header: ``metadata.invocation`` (exact command line, jplace.cpp:71-78),
  ``tree`` (jplace-annotated newick), ``version: 3``, ``fields`` in the fixed
  order ``[edge_num, likelihood, like_weight_ratio, distal_length,
  pendant_length]`` (jplace.cpp:92-102);
* per-batch appends of placement objects (jplace.cpp:21-38; the file is
  reopened in append mode per batch -- we keep a handle and flush instead,
  which enables the same restart-from-batch-N property, SURVEY.md section 5.3);
* rapidjson PrettyWriter formatting: 4-space indent, single-line inner arrays
  (jplace.cpp:44,127-135), ``"nm"`` entries ``[header, 1]`` per duplicate
  read (jplace.cpp:142-158, quirk Q8);
* rapidjson double formatting (Grisu2 shortest + rapidjson's
  fixed/exponential cutover) so likelihood values serialize byte-identically.
"""

from __future__ import annotations

import json
import math
import re

from ..engine.types import PlacedCollection

__all__ = ["format_double", "jplace_writer", "FIELDS"]

FIELDS = ["edge_num", "likelihood", "like_weight_ratio", "distal_length", "pendant_length"]

_REPR_RE = re.compile(r"^(-?)(\d+)(?:\.(\d+))?(?:e([+-]\d+))?$")


def format_double(x: float) -> str:
    """Format a double the way rapidjson's Writer::Double does.

    Grisu2 produces the shortest round-trip digits (Python ``repr`` does
    too); rapidjson's Prettify then chooses fixed notation when the decimal
    exponent kk is in (-6, 21], else exponential with an unpadded exponent
    (no ``+``, no leading zeros) -- unlike Python's ``repr`` which switches at
    different thresholds and pads exponents to two digits.
    """
    r = repr(float(x))
    # fast path: where Python repr uses fixed notation (1e-4 <= |x| < 1e16),
    # rapidjson's output is identical (same shortest digits, same ".0"
    # convention), so no reformatting is needed -- this covers almost every
    # likelihood/LWR/length value and makes batch writes ~3x faster
    if "e" not in r and "n" not in r:  # no exponent, not nan/inf
        return r
    if math.isnan(x) or math.isinf(x):
        # rapidjson with default flags refuses NaN/Inf (Writer::Double returns
        # false and emits nothing, producing a malformed row).  We emit the
        # conventional JSON-extension tokens instead -- a conscious divergence.
        if math.isnan(x):
            return "NaN"
        return "-Infinity" if x < 0 else "Infinity"
    m = _REPR_RE.match(r)
    if not m:  # pragma: no cover - repr always matches
        return r
    sign, int_part, frac_part, exp_part = m.groups()
    frac_part = frac_part or ""
    digits = (int_part + frac_part).lstrip("0") or "0"
    if digits == "0":
        return sign + "0.0"
    # kk: position of the decimal point relative to the first significant
    # digit: value = 0.<digits> * 10**kk
    n_lead = len(int_part + frac_part) - len((int_part + frac_part).lstrip("0"))
    kk = len(int_part) - n_lead + (int(exp_part) if exp_part else 0)
    digits = digits.rstrip("0") or "0"
    ln = len(digits)
    if 0 < kk <= 21:
        if ln <= kk:  # 1234000.0
            return sign + digits + "0" * (kk - ln) + ".0"
        return sign + digits[:kk] + "." + digits[kk:]
    if -6 < kk <= 0:  # 0.0001234
        return sign + "0." + "0" * (-kk) + digits
    # exponential: d.ddd e (kk-1)
    e = kk - 1
    mant = digits[0] + ("." + digits[1:] if ln > 1 else "")
    return f"{sign}{mant}e{e}"


def scan_partial(filename: str) -> tuple[int, int]:
    """Diagnostic: count complete placement objects' reads in a partial file.

    NOTE: resume does NOT use this -- dedup (quirk Q8) writes objects in
    first-occurrence order, so an object count can misalign with the input
    record order when a crash lands mid-batch among duplicate sequences.
    The authoritative resume state is the ``<output>.resume`` sidecar
    written atomically after each flushed batch (see jplace_writer).
    Returns ``(num_reads_in_complete_objects, offset_after_last_object)``.
    """
    with open(filename, "r", encoding="utf-8") as f:
        text = f.read()
    start = text.find('"placements": [')
    if start < 0:
        return 0, 0
    pos = start + len('"placements": [')
    num_reads = 0
    truncate_to = pos
    depth = 0
    in_string = False
    escape = False
    obj_start = None
    i = pos
    while i < len(text):
        ch = text[i]
        if in_string:
            if escape:
                escape = False
            elif ch == "\\":
                escape = True
            elif ch == '"':
                in_string = False
        elif ch == '"':
            in_string = True
        elif ch == "{":
            if depth == 0:
                obj_start = i
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0:
                # a complete placement object; count its nm entries
                try:
                    parsed = json.loads(text[obj_start : i + 1])
                except ValueError:
                    break  # trailing garbage: truncate before it
                num_reads += len(parsed.get("nm", []))
                truncate_to = i + 1
        i += 1
    return num_reads, truncate_to


class jplace_writer:
    """Streaming writer with the reference's start / << / end protocol
    (reference: main.cpp:302-303,361,366).

    ``resume=True`` reopens a partial file: truncates to the last complete
    placement object and continues appending (restart-from-batch-N,
    SURVEY.md section 5.3 -- the reference appends per batch but has no
    resume logic)."""

    def __init__(self, filename: str, invocation: str, newick_tree: str,
                 resume: bool = False):
        import os

        self._filename = filename
        self._sidecar = filename + ".resume"
        self._invocation = invocation
        self._tree = newick_tree
        self.resumed_reads = 0
        self._reads_written = 0
        state = None
        if resume and os.path.exists(filename) and os.path.exists(self._sidecar):
            try:
                with open(self._sidecar) as f:
                    state = json.load(f)
                if not (
                    isinstance(state.get("reads"), int)
                    and isinstance(state.get("bytes"), int)
                    and 0 < state["bytes"] <= os.path.getsize(filename)
                ):
                    state = None
            except (ValueError, OSError):
                state = None
        if state is not None:
            # truncate to the last fully-flushed BATCH boundary: batches are
            # contiguous input-record ranges, so skipping state["reads"]
            # records is exact even with mid-batch duplicate sequences
            self.resumed_reads = self._reads_written = state["reads"]
            self._out = open(filename, "r+", encoding="utf-8")
            self._out.truncate(state["bytes"])
            self._out.seek(state["bytes"])
            self._first_placement = state["reads"] == 0
            self._resumed = True
        else:
            self._out = open(filename, "w", encoding="utf-8")
            self._first_placement = True
            self._resumed = False

    def start(self) -> None:
        """Write the header and open the placements array
        (reference: jplace.cpp:40-59).  No-op on a resumed file."""
        if self._resumed:
            return
        w = self._out
        w.write("{\n")
        w.write('    "metadata": {\n')
        w.write(f'        "invocation": {json.dumps(self._invocation)}\n')
        w.write("    },\n")
        w.write(f'    "tree": {json.dumps(self._tree)},\n')
        w.write('    "version": 3,\n')
        fields = ", ".join(json.dumps(f) for f in FIELDS)
        w.write(f'    "fields": [{fields}],\n')
        w.write('    "placements": [')
        w.flush()

    def write(self, placed: PlacedCollection) -> None:
        """Append one batch (reference: jplace.cpp:21-38).

        Array-backed batches (engine/types.py::ArrayPlacedCollection) take
        the native fast path: the whole batch serializes in one C++ call
        (native/epik_host.cpp::eh_format_jplace), byte-identical to the
        Python loop below, without ever building Placement objects.
        """
        if getattr(placed, "keep", None) is not None:
            try:
                from ..native import load_native, native_format_jplace

                native = load_native() is not None
            except Exception:
                native = False
            if native and placed.seqs:
                headers = [placed.sequence_map[s] for s in placed.seqs]
                text, n_reads = native_format_jplace(
                    placed.ids, placed.scores, placed.wr, placed.dist,
                    placed.pend, placed.keep, headers,
                    self._first_placement,
                )
                self._out.write(text)
                self._first_placement = False
                self._reads_written += n_reads
                self._out.flush()
                self._write_sidecar()
                return
        w = self._out
        for placed_seq in placed.placed_seqs:
            if not self._first_placement:
                w.write(",")
            self._first_placement = False
            w.write("\n        {\n")
            # "p" rows (jplace.cpp:121-140): single-line inner arrays
            w.write('            "p": [')
            for i, p in enumerate(placed_seq.placements):
                if i:
                    w.write(",")
                row = ", ".join(
                    [
                        str(int(p.branch_id)),
                        format_double(p.score),
                        format_double(p.weight_ratio),
                        format_double(p.distal_length),
                        format_double(p.pendant_length),
                    ]
                )
                w.write(f"\n                [{row}]")
            w.write("\n            ],\n" if placed_seq.placements else "],\n")
            # "nm" rows (jplace.cpp:142-158): [header, 1] per duplicate header
            headers = placed.sequence_map[placed_seq.sequence]
            w.write('            "nm": [')
            for i, h in enumerate(headers):
                if i:
                    w.write(",")
                w.write(f"\n                [{json.dumps(h)}, 1]")
            w.write("\n            ]\n" if headers else "]\n")
            w.write("        }")
            self._reads_written += len(headers)
        w.flush()
        self._write_sidecar()

    def _write_sidecar(self) -> None:
        """Atomically persist the resume checkpoint (reads + byte offset)."""
        import os

        tmp = self._sidecar + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"reads": self._reads_written, "bytes": self._out.tell()}, f)
        os.replace(tmp, self._sidecar)

    # operator<< sugar
    def __lshift__(self, placed: PlacedCollection) -> "jplace_writer":
        self.write(placed)
        return self

    def end(self) -> None:
        """Close arrays and the file (reference: jplace.cpp:61-69); the
        resume checkpoint is removed -- the run is complete."""
        import os

        self._out.write("\n    ]\n}")
        self._out.close()
        try:
            os.remove(self._sidecar)
        except OSError:
            pass
