.PHONY: test test-fast bench native tmscore pdbio smoke serve quality clean

test:
	python -m pytest tests/ -q

# fast subset (<~3 min): skips compile-heavy slow-marked modules
test-fast:
	python -m pytest tests/ -q -m 'not slow'

tmscore:
	$(MAKE) -C native/tmscore

pdbio:
	$(MAKE) -C native/pdbio

native: tmscore pdbio

bench:
	python bench.py

# resident sampling server (tiny model for local dev; use --ckpt + full scale
# in production)
serve:
	python -m esmdiff_tpu.cli.serve --model_scale tiny --mode gibbs --port 8000

# end-to-end coordinate-level quality experiment (PERF.md table)
quality:
	JAX_PLATFORM_NAME=cpu python scripts/quality_loop.py

# joint VQ-VAE tokenizer training, tiny smoke (production: --scale mid/full)
train-vqvae-smoke:
	JAX_PLATFORM_NAME=cpu python -m esmdiff_tpu.cli.train_vqvae \
	  --input /root/reference/data/targets/bpti --output /tmp/esmdiff_vq \
	  --scale tiny --steps 40 --batch 2 --max_len 80

# real-weight-day runbook smoke: download(fixture)->verify->convert->
# quant-parity->bench->campaign on reference-layout fixture checkpoints
# (scripts/real_weight_day.py; real usage documented in its docstring)
real-weight-day-smoke:
	python scripts/real_weight_day.py --fixture

# 5-minute end-to-end smoke: dump a tiny corpus, train 2 epochs, sample, analyze
smoke:
	JAX_PLATFORM_NAME=cpu python -m esmdiff_tpu.cli.dump \
	  /root/reference/data/targets/bpti /tmp/esmdiff_smoke/enc --model_scale tiny
	JAX_PLATFORM_NAME=cpu python -m esmdiff_tpu.cli.train \
	  --config configs/mdlm_smoke.yaml data.path=/tmp/esmdiff_smoke/enc \
	  data.batch_size=1 trainer.ckpt_dir=/tmp/esmdiff_smoke/run
	JAX_PLATFORM_NAME=cpu python -m esmdiff_tpu.cli.sample \
	  --input /root/reference/data/targets/bpti --output /tmp/esmdiff_smoke/out \
	  --mode ddpm --num_steps 4 --num_samples 2 --model_scale tiny

clean:
	rm -rf native/tmscore/build native/pdbio/build output
