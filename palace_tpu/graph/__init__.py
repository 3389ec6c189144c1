from palace_tpu.graph.builder import GraphParams, build_graph_from_bam, write_graph_output
from palace_tpu.graph.depth import DepthStore, compute_depth, average_depth_of_file
