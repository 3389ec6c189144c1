from palace_tpu.search.index import PhageIndex, build_index, load_or_build_index
from palace_tpu.search.eref import count_reads_into_table, search_references, write_ref_names
