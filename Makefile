.PHONY: all native test bench clean

all: native

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
	rm -rf build dist *.egg-info
