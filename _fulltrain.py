import time
from mygauhuman_tpu.cli.train import main
t0 = time.time()
result = main([
    "--synthetic", "--synthetic_size", "512",
    "--iterations", "1200",
    "--test_iterations", "600", "1200",
    "--save_iterations", "1200",
    "--model_path", "/tmp/full_synth",
    "--use_pallas",
])
print("RESULT:", result, flush=True)
