"""``python -m palace_tpu --config config.txt`` — the reference's
``palace --config`` entry point (palace:16-24)."""
from palace_tpu.pipeline.driver import main

if __name__ == "__main__":
    raise SystemExit(main())
