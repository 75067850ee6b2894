.PHONY: all native test bench clean black blackcheck lint typecheck \
	docscheck check

all: native

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

black:
	black ffsubsync_tpu tests scripts bench.py __graft_entry__.py setup.py

blackcheck:
	black --check ffsubsync_tpu tests scripts bench.py __graft_entry__.py setup.py

lint:
	flake8 ffsubsync_tpu tests scripts bench.py __graft_entry__.py setup.py

typecheck:
	mypy ffsubsync_tpu

docscheck:  # docs/cli.md is generated from the parser; fail on drift
	python scripts/gen_cli_docs.py --check

# format + lint + types + full suite incl. the data-driven integration tier
# (parity: reference Makefile:16-33 `check`)
check: blackcheck lint typecheck docscheck
	INTEGRATION=1 python -m pytest tests/ -q

bench:
	python bench.py

bench-batch:
	python scripts/bench_batch.py

precompile:
	python scripts/precompile.py 90

eval-vad:  # adversarial per-condition VAD accuracy (refreshes EVAL.md)
	python scripts/eval_neural_vad.py --update-eval-md

eval-agreement:  # end-to-end per---vad offset MAE over perturbed movies;
	# --check-bars turns EVAL.md's binding bars into a nonzero exit
	python scripts/eval_vad_agreement.py --check-bars

clean:
	$(MAKE) -C native clean
	rm -rf build dist *.egg-info
