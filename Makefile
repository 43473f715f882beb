# seld_tpu developer entry points (see CLAUDE.md for environment gotchas)

.PHONY: test test-fast bench train-smoke graft-check native

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

bench:
	python bench.py

bench-parity:
	python bench.py --dtype float32 --batch 4

graft-check:
	python __graft_entry__.py

native:
	python -c "from seld_tpu.data.native import build_library; print(build_library(force=True))"
