# Top-level targets.  The native library build lives in native/Makefile.

.PHONY: test bench native validate-real

test:
	env -u PYTHONPATH JAX_PLATFORMS=cpu \
	  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	  python -m pytest tests/ -q

bench:
	python bench.py

native:
	$(MAKE) -C native

# The one unproven claim in this environment (zero egress): real-model MTEB
# score parity vs the reference's published numbers (BASELINE.md).  Run this
# on a NETWORKED host; it downloads all-MiniLM-L6-v2, converts it to every
# ftype, runs the eval harness, and gates each score against the pinned
# reference baselines (README "Validating against the reference scores").
MODEL ?= sentence-transformers/all-MiniLM-L6-v2
MODEL_DIR ?= /tmp/tpuembed-validate-model
validate-real:
	python -m embedding_cpp_tpu.cli.hub download $(MODEL) $(MODEL_DIR)
	python benchmarks/run_eval.py --hf-dir $(MODEL_DIR) \
	  --model-name $(notdir $(MODEL)) \
	  --modes f32 f16 q4_0 q4_1 q8_0 --warmup --assert-baseline
