"""BGZF/BAM reading and writing, dependency-free.

The reference links htslib (generate_graph.cpp:1) and shells out to
samtools for depth (palace:541).  This module provides:

* a BGZF block reader/writer (zlib raw-deflate with the BC extra field),
* a BAM record parser exposing the fields the pipeline needs
  (flag, tid, pos, mapq, CIGAR, mate info, NM/SA tags),
* a minimal BAM writer used by tests to fabricate alignments.

It doubles as the pure-Python fallback for the fast C++ reader in
``native/`` and as the oracle the C++ implementation is tested against.
"""
from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple

CIGAR_OPS = "MIDNSHP=X"
_CONSUMES_REF = set("MDN=X")
_CONSUMES_READ = set("MIS=X")

FLAG_PAIRED = 0x1
FLAG_UNMAP = 0x4
FLAG_MUNMAP = 0x8
FLAG_REVERSE = 0x10
FLAG_MREVERSE = 0x20
FLAG_SECONDARY = 0x100
FLAG_QCFAIL = 0x200
FLAG_DUP = 0x400
FLAG_SUPPLEMENTARY = 0x800

_SEQ_CODES = "=ACMGRSVTWYHKDBN"


# ---------------------------------------------------------------------------
# BGZF
# ---------------------------------------------------------------------------

def bgzf_decompress(path: str | Path) -> bytes:
    """Concatenated-gzip decode (BGZF is a valid multi-member gzip)."""
    out = []
    with open(path, "rb") as fh:
        data = fh.read()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(data[pos:]))
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return b"".join(out)


def bgzf_compress_block(payload: bytes) -> bytes:
    """One BGZF block (≤64 KiB payload)."""
    compressor = zlib.compressobj(6, zlib.DEFLATED, -15)
    cdata = compressor.compress(payload) + compressor.flush()
    bsize = len(cdata) + 25  # header(18) + cdata + crc(4) + isize(4), minus 1
    header = struct.pack(
        "<BBBBIBBHBBHH",
        31, 139, 8, 4,  # gzip magic, deflate, FEXTRA
        0, 0, 255,      # mtime, xfl, os
        6,              # xlen
        66, 67, 2,      # 'B','C', slen
        bsize,
    )
    return header + cdata + struct.pack("<II", zlib.crc32(payload) & 0xFFFFFFFF, len(payload))


BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def bgzf_write(path: str | Path, payload: bytes) -> None:
    with open(path, "wb") as fh:
        for i in range(0, len(payload), 60000):
            fh.write(bgzf_compress_block(payload[i : i + 60000]))
        if not payload:
            fh.write(bgzf_compress_block(b""))
        fh.write(BGZF_EOF)


# ---------------------------------------------------------------------------
# BAM records
# ---------------------------------------------------------------------------

@dataclass
class BamRecord:
    name: str
    flag: int
    tid: int
    pos: int          # 0-based leftmost
    mapq: int
    cigar: List[Tuple[int, str]]  # [(len, op), ...]
    mtid: int
    mpos: int
    tlen: int
    seq_len: int
    tags: Dict[str, object] = field(default_factory=dict)

    @property
    def is_unmapped(self) -> bool:
        return bool(self.flag & FLAG_UNMAP)

    @property
    def is_reverse(self) -> bool:
        return bool(self.flag & FLAG_REVERSE)

    def cigar_string(self) -> str:
        return "".join(f"{n}{op}" for n, op in self.cigar)

    def ref_len(self) -> int:
        return sum(n for n, op in self.cigar if op in _CONSUMES_REF)

    def read_len(self) -> int:
        return sum(n for n, op in self.cigar if op in _CONSUMES_READ)

    def match_len(self) -> int:
        return sum(n for n, op in self.cigar if op in "M=X")


@dataclass
class BamFile:
    references: List[Tuple[str, int]]
    records: List[BamRecord]

    def name_to_tid(self) -> Dict[str, int]:
        return {name: i for i, (name, _) in enumerate(self.references)}


def _parse_aux(data: bytes) -> Dict[str, object]:
    tags: Dict[str, object] = {}
    i = 0
    n = len(data)
    while i + 3 <= n:
        tag = data[i : i + 2].decode()
        typ = chr(data[i + 2])
        i += 3
        if typ == "A":
            tags[tag] = chr(data[i]); i += 1
        elif typ == "c":
            tags[tag] = struct.unpack_from("<b", data, i)[0]; i += 1
        elif typ == "C":
            tags[tag] = struct.unpack_from("<B", data, i)[0]; i += 1
        elif typ == "s":
            tags[tag] = struct.unpack_from("<h", data, i)[0]; i += 2
        elif typ == "S":
            tags[tag] = struct.unpack_from("<H", data, i)[0]; i += 2
        elif typ == "i":
            tags[tag] = struct.unpack_from("<i", data, i)[0]; i += 4
        elif typ == "I":
            tags[tag] = struct.unpack_from("<I", data, i)[0]; i += 4
        elif typ == "f":
            tags[tag] = struct.unpack_from("<f", data, i)[0]; i += 4
        elif typ in ("Z", "H"):
            end = data.index(b"\x00", i)
            tags[tag] = data[i:end].decode()
            i = end + 1
        elif typ == "B":
            sub = chr(data[i]); cnt = struct.unpack_from("<I", data, i + 1)[0]
            size = {"c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4, "f": 4}[sub]
            i += 5 + cnt * size
            tags[tag] = None  # arrays unused by the pipeline
        else:
            break
    return tags


def read_bam(path: str | Path) -> BamFile:
    data = bgzf_decompress(path)
    if data[:4] != b"BAM\x01":
        raise ValueError(f"{path}: not a BAM file")
    off = 4
    (l_text,) = struct.unpack_from("<i", data, off)
    off += 4 + l_text
    (n_ref,) = struct.unpack_from("<i", data, off)
    off += 4
    refs: List[Tuple[str, int]] = []
    for _ in range(n_ref):
        (l_name,) = struct.unpack_from("<i", data, off)
        off += 4
        name = data[off : off + l_name - 1].decode()
        off += l_name
        (l_ref,) = struct.unpack_from("<i", data, off)
        off += 4
        refs.append((name, l_ref))

    records: List[BamRecord] = []
    n = len(data)
    while off + 4 <= n:
        (block_size,) = struct.unpack_from("<i", data, off)
        off += 4
        end = off + block_size
        (tid, pos, l_read_name, mapq, _bin, n_cigar, flag, l_seq, mtid, mpos, tlen) = (
            struct.unpack_from("<iiBBHHHiiii", data, off)
        )
        p = off + 32
        name = data[p : p + l_read_name - 1].decode()
        p += l_read_name
        cigar = []
        for _ in range(n_cigar):
            (v,) = struct.unpack_from("<I", data, p)
            cigar.append((v >> 4, CIGAR_OPS[v & 0xF]))
            p += 4
        p += (l_seq + 1) // 2  # seq
        p += l_seq  # qual
        tags = _parse_aux(data[p:end])
        records.append(
            BamRecord(name, flag, tid, pos, mapq, cigar, mtid, mpos, tlen, l_seq, tags)
        )
        off = end
    return BamFile(references=refs, records=records)


# ---------------------------------------------------------------------------
# writer (tests / fixtures)
# ---------------------------------------------------------------------------

def _encode_aux(tags: Dict[str, object]) -> bytes:
    out = b""
    for tag, val in tags.items():
        if isinstance(val, int):
            out += tag.encode() + b"i" + struct.pack("<i", val)
        elif isinstance(val, str) and len(val) == 1 and tag == "XA":
            out += tag.encode() + b"A" + val.encode()
        elif isinstance(val, str):
            out += tag.encode() + b"Z" + val.encode() + b"\x00"
        elif isinstance(val, float):
            out += tag.encode() + b"f" + struct.pack("<f", val)
    return out


def write_bam(path: str | Path, bam: BamFile, text: str = "") -> None:
    body = b"BAM\x01"
    body += struct.pack("<i", len(text)) + text.encode()
    body += struct.pack("<i", len(bam.references))
    for name, length in bam.references:
        body += struct.pack("<i", len(name) + 1) + name.encode() + b"\x00"
        body += struct.pack("<i", length)
    for r in bam.records:
        name_b = r.name.encode() + b"\x00"
        cigar_b = b"".join(
            struct.pack("<I", (n << 4) | CIGAR_OPS.index(op)) for n, op in r.cigar
        )
        l_seq = r.seq_len
        seq_b = b"\x00" * ((l_seq + 1) // 2)
        qual_b = b"\xff" * l_seq
        aux = _encode_aux(r.tags)
        rec = struct.pack(
            "<iiBBHHHiiii",
            r.tid, r.pos, len(name_b), r.mapq, 0, len(r.cigar), r.flag,
            l_seq, r.mtid, r.mpos, r.tlen,
        ) + name_b + cigar_b + seq_b + qual_b + aux
        body += struct.pack("<i", len(rec)) + rec
    bgzf_write(path, body)
