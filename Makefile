# Common entry points. CPU jax targets clear the TPU-tunnel env (CLAUDE.md).
CPU_ENV = env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
          XLA_FLAGS=--xla_force_host_platform_device_count=8

.PHONY: test native bench sandbox dryrun gates clean

ROUND ?= 5

native:
	$(MAKE) -C native

test: native
	$(CPU_ENV) python -m pytest tests/ -q

bench:
	python bench.py

sandbox:
	$(CPU_ENV) python scripts/make_verify_sandbox.py

dryrun:
	$(CPU_ENV) python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

# per-round on-hardware numeric gates (default TPU env, ~25 min total;
# each writes its *_r$(ROUND).json artifact — see .claude/skills/verify)
gates:
	python scripts/pallas_tpu_parity.py --round $(ROUND)
	python scripts/streaming_tpu_parity.py --round $(ROUND)

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
