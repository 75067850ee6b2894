.PHONY: all native test bench clean black blackcheck lint typecheck \
	docscheck check certify eval-vad eval-agreement

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

certify:  # the binding release gate, on the HELD-OUT seed family (see
	# EVAL.md "Tuning vs certification"): seed 7919 draws were never used
	# to tune gate constants, select retrains, or set thresholds — only
	# seed-0-family draws were. Both harnesses must exit 0 here.
	python scripts/eval_vad_agreement.py --check-bars --seed 7919 \
		--vads fused,webrtc,silero
	python scripts/eval_neural_vad.py --seed 7919 --backends silero,fused

clean:
	$(MAKE) -C native clean
	rm -rf build dist *.egg-info
