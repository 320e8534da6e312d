# Convenience targets. TPU jobs must run one-at-a-time (see CLAUDE.md).

.PHONY: test bench native synth clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	$(MAKE) -C native

synth:
	python scripts/make_synthetic_data.py data/shape_net_voxel_data_v1

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache
