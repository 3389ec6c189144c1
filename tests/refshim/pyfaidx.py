"""pyfaidx shim — corrected_dup.py imports `Fasta` at module load but
its split_fasta/get_prefix users are dead code in __main__; the shim
still implements the accessed surface (keys, indexing, slicing with
.reverse.complement) in case a scenario reaches it."""


class _Slice:
    def __init__(self, seq: str):
        self._seq = seq

    def __str__(self):
        return self._seq

    def __len__(self):
        return len(self._seq)

    @property
    def reverse(self):
        return _Slice(self._seq[::-1])

    @property
    def complement(self):
        table = str.maketrans("ACGTNacgtn", "TGCANtgcan")
        return _Slice(self._seq.translate(table))


class _Record:
    def __init__(self, seq: str):
        self._seq = seq

    def __getitem__(self, item):
        return _Slice(self._seq[item])

    def __str__(self):
        return self._seq

    def __len__(self):
        return len(self._seq)


class Fasta:
    def __init__(self, path, **kwargs):
        self._seqs = {}
        name = None
        chunks = []
        with open(path) as fh:
            for line in fh:
                line = line.rstrip("\n")
                if line.startswith(">"):
                    if name is not None:
                        self._seqs[name] = _Record("".join(chunks))
                    name = line[1:].split()[0] if line[1:].split() else ""
                    chunks = []
                else:
                    chunks.append(line.strip())
        if name is not None:
            self._seqs[name] = _Record("".join(chunks))

    def keys(self):
        return self._seqs.keys()

    def __getitem__(self, name):
        return self._seqs[name]

    def __contains__(self, name):
        return name in self._seqs
