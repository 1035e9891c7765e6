# Developer entry points

.PHONY: test bench native dataset clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	$(MAKE) -C native

dataset:
	cd python && python make_dataset.py --out ../test-data --cams 2 --frames 60 --image_scenes 2

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
