"""Bio.Seq.Seq shim: str subclass with reverse_complement (IUPAC map,
case-preserving — mirrors Biopython semantics for the bases the
pipeline's FASTAs contain)."""

_COMP = {
    "A": "T", "T": "A", "G": "C", "C": "G", "U": "A",
    "R": "Y", "Y": "R", "S": "S", "W": "W", "K": "M", "M": "K",
    "B": "V", "V": "B", "D": "H", "H": "D", "N": "N",
}
_TABLE = str.maketrans(
    {**_COMP, **{k.lower(): v.lower() for k, v in _COMP.items()}}
)


class Seq(str):
    def reverse_complement(self) -> "Seq":
        return Seq(self.translate(_TABLE)[::-1])

    def complement(self) -> "Seq":
        return Seq(self.translate(_TABLE))

    def __add__(self, other) -> "Seq":
        return Seq(str.__add__(self, str(other)))

    def __radd__(self, other) -> "Seq":
        return Seq(str(other) + str(self))

    def __getitem__(self, item):
        return Seq(str.__getitem__(self, item))
