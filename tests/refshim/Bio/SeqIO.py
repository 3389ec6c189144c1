"""Bio.SeqIO shim: fasta parse/to_dict only (the reference scripts'
entire SeqIO surface)."""
from .Seq import Seq


class SeqRecord:
    def __init__(self, rec_id: str, seq: Seq, description: str = ""):
        self.id = rec_id
        self.name = rec_id
        self.seq = seq
        self.description = description

    def __len__(self):
        return len(self.seq)


def parse(path, fmt):
    assert fmt == "fasta", f"shim supports fasta only, got {fmt!r}"
    name = None
    desc = ""
    chunks = []
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if line.startswith(">"):
                if name is not None:
                    yield SeqRecord(name, Seq("".join(chunks)), desc)
                header = line[1:]
                name = header.split()[0] if header.split() else ""
                desc = header
                chunks = []
            else:
                chunks.append(line.strip())
    if name is not None:
        yield SeqRecord(name, Seq("".join(chunks)), desc)


def to_dict(records):
    out = {}
    for rec in records:
        if rec.id in out:
            raise ValueError(f"Duplicate key '{rec.id}'")
        out[rec.id] = rec
    return out
