"""Minimal Biopython stand-in for running the REFERENCE scripts under
differential test (tests/test_refscript_differential.py).

The reference's filter_result.py / make_final_fa.py / get_ref_by_index.py /
corrected_dup.py import only `Bio.SeqIO.parse/to_dict` and `Bio.Seq.Seq`
(with `.reverse_complement()` and string concatenation).  This shim
implements exactly that surface so the unmodified reference scripts run
in an environment without Biopython.  It is test scaffolding ONLY —
nothing in palace_tpu imports it.
"""
from . import Seq, SeqIO  # noqa: F401
