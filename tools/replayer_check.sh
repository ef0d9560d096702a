#!/bin/sh
# Exercise the native PJRT replayer's run mode against the real TPU via the
# axon relay plugin, and assert numeric parity with JAX. (On a real v5e host,
# drop the AXON_* env and pass libtpu.so with no key=value options.)
set -e
cd "$(dirname "$0")/.."
make -C native replayer
D=$(mktemp -d)
PYTHONPATH=. python - "$D" <<'EOF'
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "cpu")
from jax import export as jexport
d = sys.argv[1]
fn = lambda x: jnp.cumsum(x.astype(jnp.float32)) * 0.5
e = jexport.export(jax.jit(fn))(jax.ShapeDtypeStruct((16,), jnp.uint8))
open(f"{d}/p.mlir", "w").write(e.mlir_module())
np.arange(16, dtype=np.uint8).tofile(f"{d}/in.bin")
np.save(f"{d}/ref.npy", np.asarray(fn(jnp.arange(16, dtype=jnp.uint8))))
EOF
cd "$D"
AXON_POOL_SVC_OVERRIDE=127.0.0.1 AXON_LOOPBACK_RELAY=1 \
TPU_WORKER_HOSTNAMES=localhost \
"$OLDPWD/native/build/pjrt_replayer" run p.mlir in.bin \
  /opt/axon/libaxon_pjrt.so remote_compile=1 local_only=0 priority=0 \
  topology=v5e:1x1x1 n_slices=1 rank=4294967295 "session_id=replayer-$$"
python - "$D" <<'EOF'
import sys
import numpy as np
d = sys.argv[1]
got = np.fromfile(f"{d}/replayer_out0.bin", np.float32)
ref = np.load(f"{d}/ref.npy")
assert np.allclose(got, ref), f"MISMATCH {got} vs {ref}"
print("NUMERIC PARITY OK: native replayer == jax")
EOF
