import jax; jax.config.update("jax_platforms", "cpu")
import importlib, sys
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
pkgs = ["graph", "ops", "nn", "models", "attention", "training", "parallel",
        "index", "sona", "transformer", "graph_transformer", "mincut",
        "solver", "serve", "utils", "native"]
out = ["# API index", "",
       "Auto-generated public-surface index (`__all__` per subpackage).", ""]
for p in pkgs:
    m = importlib.import_module(f"ruvector_tpu.{p}")
    names = getattr(m, "__all__", None)
    if names is None:
        names = sorted(n for n in dir(m) if not n.startswith("_")
                       and not getattr(getattr(m, n), "__name__", "").startswith("ruvector_tpu."))
        names = [n for n in names if type(getattr(m, n)).__name__ != "module"]
    out.append(f"## ruvector_tpu.{p}")
    out.append("")
    for n in sorted(set(names)):
        out.append(f"- `{n}`")
    out.append("")
open(str(__import__("pathlib").Path(__file__).resolve().parent.parent / "docs" / "API.md"), "w").write("\n".join(out) + "\n")
print("entries:", sum(1 for l in out if l.startswith("- ")))
