# Developer targets (the reference ships a cookiecutter Makefile; these are
# the useful equivalents for this repo).

.PHONY: test test-fast lint bench bench-extract native clean parity parity-full

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -x -m "not slow"

lint:
	python -m compileall -q phantom_vlb_tpu bench.py bench_extract.py __graft_entry__.py

native:
	$(MAKE) -C native/decode

bench:
	python bench.py

bench-extract:
	python bench_extract.py

# Full-WIDTH conversion parity for all three converter halves; rerun after
# any converter/model change.  Depth 4 for Mistral (depth is module-invariant,
# docs/parity_runs.md); clip/stc run at their real fixed geometry.
# ~30-90 min total on 1 vCPU; JAX_PLATFORMS=cpu keeps it off the TPU tunnel.
parity:
	JAX_PLATFORMS=cpu python scripts/full_width_parity.py --layers 4 --out /tmp/fwparity_mistral
	JAX_PLATFORMS=cpu python scripts/full_width_parity.py --component clip --out /tmp/fwparity_clip
	JAX_PLATFORMS=cpu python scripts/full_width_parity.py --component stc --oracle hf

# Day-one real-artifact runbook (VERDICT r4 ask 7): the ONE command to run
# when the real VideoLLaMA2-7B shards / shipped tokenizer become available.
# Stages: inventory, stream-convert + strict-load accounting, Mistral &
# CLIP activation parity vs HF torch, tokenizer byte checks + joiner
# re-derivation.  Start cheap: make parity-real CKPT=<dir> LAYERS=4, then
# rerun without LAYERS for the full 32-layer pass.
CKPT ?=
TOK ?=
LAYERS ?=
parity-real:
	JAX_PLATFORMS=cpu python scripts/parity_real.py \
		$(if $(CKPT),--ckpt $(CKPT)) $(if $(TOK),--tokenizer $(TOK)) \
		$(if $(LAYERS),--layers $(LAYERS))

# Deeper Mistral run (depth 8); several hours on 1 vCPU.
parity-full:
	JAX_PLATFORMS=cpu python scripts/full_width_parity.py --layers 8 --out /tmp/fwparity8
	JAX_PLATFORMS=cpu python scripts/full_width_parity.py --component clip --out /tmp/fwparity_clip
	JAX_PLATFORMS=cpu python scripts/full_width_parity.py --component stc --oracle hf
	JAX_PLATFORMS=cpu python scripts/full_width_parity.py --component stc --oracle timm

clean:
	rm -rf .jax_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
	$(MAKE) -C native/decode clean
