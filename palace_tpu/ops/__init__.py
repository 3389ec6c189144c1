from palace_tpu.ops.encoder import (
    encode_batch,
    encode_sequences,
    seq_to_kmer_locs,
    transition_features,
)
