from palace_tpu.matching.solver import MatchingOptions, solve_graph_file, solve_matching
