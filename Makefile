.PHONY: test check check-fast native bench bench-finetune bench-decode dryrun clean

test:
	python -m pytest tests/ -q

# Mandatory before the final commit of a build round (CLAUDE.md):
# full suite + driver-contract smokes + multichip dryrun.
check:
	python tools/preflight.py

check-fast:
	python tools/preflight.py --fast

native:
	$(MAKE) -C csrc

bench:
	python bench.py

bench-finetune:
	python bench.py --finetune

bench-decode:
	python -m gpt2_vision_language_tpu.cli.bench_decode --uncached-baseline

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c \
		"import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	$(MAKE) -C csrc clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
