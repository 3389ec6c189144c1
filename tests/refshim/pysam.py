"""pysam shim for running the REFERENCE scripts under differential test.

Surface used by the reference:
- make_fa_from_path.py: FastaFile(path).fetch(name)  (raises on missing)
- create_sub_graph.py:  TabixFile(depth.gz) context manager with
  .contigs and .fetch(contig) yielding raw 'contig\tpos\tdepth' rows.

The TabixFile shim reads the whole (b)gzip/plain text file once instead
of using an index — fine for test-sized files and bit-equivalent to a
tabix fetch over a position-sorted depth file.
"""
import gzip


class FastaFile:
    def __init__(self, path):
        self._seqs = {}
        name = None
        chunks = []
        with open(path) as fh:
            for line in fh:
                line = line.rstrip("\n")
                if line.startswith(">"):
                    if name is not None:
                        self._seqs[name] = "".join(chunks)
                    name = line[1:].split()[0] if line[1:].split() else ""
                    chunks = []
                else:
                    chunks.append(line.strip())
        if name is not None:
            self._seqs[name] = "".join(chunks)

    @property
    def references(self):
        return list(self._seqs)

    def fetch(self, reference=None, start=None, end=None):
        if reference not in self._seqs:
            raise KeyError(f"sequence '{reference}' not present")
        seq = self._seqs[reference]
        if start is not None or end is not None:
            return seq[start:end]
        return seq

    def close(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


class TabixFile:
    def __init__(self, path):
        opener = gzip.open if str(path).endswith(".gz") else open
        self._rows = {}
        with opener(path, "rt") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line:
                    continue
                contig = line.split("\t", 1)[0]
                self._rows.setdefault(contig, []).append(line)

    @property
    def contigs(self):
        return list(self._rows)

    def fetch(self, reference=None):
        if reference not in self._rows:
            # real pysam raises ValueError for a contig absent from the
            # index — create_sub_graph.py:210 catches this to fall back
            # to name-parsed depth
            raise ValueError(f"could not create iterator for region '{reference}'")
        return iter(self._rows[reference])

    def close(self):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
