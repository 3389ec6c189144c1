from palace_tpu.assembly.path_fa import make_fa_from_path
