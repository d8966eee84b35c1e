# Developer entry points (mirrors the reference Makefile:8-14 roles:
# lint gate + test suite + coverage-style run, adapted to this environment).

.PHONY: check tests tests-fast native bench all

check:
	python scripts/check.py

tests:
	python -m pytest tests/ -q

tests-fast:
	python -m pytest tests/ -q -x

native:
	bash native/build.sh

bench:
	python bench.py

all: check tests
