.PHONY: all native test bench clean

all: native

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

check:  # full suite incl. the data-driven integration tier (parity: reference Makefile)
	INTEGRATION=1 python -m pytest tests/ -q

bench:
	python bench.py

bench-batch:
	python scripts/bench_batch.py

precompile:
	python scripts/precompile.py 90

eval-vad:  # adversarial per-condition VAD accuracy (refreshes EVAL.md)
	python scripts/eval_neural_vad.py --update-eval-md

eval-agreement:  # end-to-end per---vad offset MAE over perturbed movies
	python scripts/eval_vad_agreement.py

clean:
	$(MAKE) -C native clean
	rm -rf build dist *.egg-info
