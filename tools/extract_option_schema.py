"""Extract the reference framework's CLI option registry (the public API contract).

AST-parses every ``parser.add_argument(...)`` call in the reference tree
(``options/*.py``, ``models/*_model.py``, ``data/*_dataset.py``) and emits a JSON
registry mapping flat flag name -> {type, default, choices, nargs, scope}.

This extracts the *interface* (flag names, types, defaults) that our TPU-native
rebuild must honor so that reference ``examples/*.json`` configs load unchanged.
No implementation code is copied. Reference: /root/reference/options/common_options.py,
train_options.py, and per-model ``modify_commandline_options`` plugins
(/root/reference/models/__init__.py:67-76).
"""

import ast
import json
import os
import sys

REF = "/root/reference"
MAX_INT = 1000000000  # util/util.py:314


def _lit(node):
    """Best-effort literal eval of a default-value AST node."""
    try:
        return True, ast.literal_eval(node)
    except (ValueError, TypeError, SyntaxError):
        pass
    if isinstance(node, ast.Name):
        if node.id == "MAX_INT":
            return True, MAX_INT
        if node.id == "inf":
            return True, float("inf")
    if isinstance(node, ast.Attribute):
        return False, ast.dump(node)
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        ok, v = _lit(node.operand)
        if ok:
            return True, -v
    if isinstance(node, ast.BinOp):
        try:
            return True, eval(compile(ast.Expression(node), "<d>", "eval"))
        except Exception:
            pass
    if isinstance(node, ast.Call):
        f = node.func
        name = getattr(f, "id", getattr(f, "attr", ""))
        if name == "float" and node.args:
            ok, v = _lit(node.args[0])
            if ok:
                return True, float(v)
    return False, ast.dump(node)


def _typename(node):
    if node is None:
        return None
    if isinstance(node, ast.Name):
        return node.id
    if isinstance(node, ast.Attribute):
        return node.attr
    return ast.dump(node)


def extract_file(path, scope):
    with open(path) as f:
        try:
            tree = ast.parse(f.read())
        except SyntaxError:
            return []
    out = []
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Call) and isinstance(node.func, ast.Attribute)
                and node.func.attr == "add_argument"):
            continue
        if not node.args or not isinstance(node.args[0], ast.Constant):
            continue
        name = node.args[0].value
        if not (isinstance(name, str) and name.startswith("--")):
            continue
        spec = {"name": name[2:], "scope": scope}
        for kw in node.keywords:
            if kw.arg == "type":
                spec["type"] = _typename(kw.value)
            elif kw.arg == "default":
                ok, v = _lit(kw.value)
                spec["default"] = v if ok else None
                if not ok:
                    spec["default_expr"] = v
            elif kw.arg == "choices":
                ok, v = _lit(kw.value)
                if ok:
                    spec["choices"] = v
                elif isinstance(kw.value, ast.Call):
                    # e.g. get_models_names(), TORCH_MODEL_CLASSES — leave open
                    spec["choices_expr"] = _typename(kw.value.func)
            elif kw.arg == "nargs":
                ok, v = _lit(kw.value)
                spec["nargs"] = v if ok else None
            elif kw.arg == "action":
                ok, v = _lit(kw.value)
                if ok and v in ("store_true", "store_false"):
                    spec["type"] = "bool"
                    spec["default"] = v == "store_false"
            elif kw.arg == "required":
                ok, v = _lit(kw.value)
                if ok:
                    spec["required"] = v
        out.append(spec)
    return out


def main():
    registry = {}
    sources = []
    for fn in ["common_options.py", "train_options.py",
               "inference_gan_options.py", "inference_diffusion_options.py"]:
        sources.append((os.path.join(REF, "options", fn), "options:" + fn[:-3]))
    mdir = os.path.join(REF, "models")
    for fn in sorted(os.listdir(mdir)):
        if fn.endswith("_model.py") or fn in ("base_model.py",):
            sources.append((os.path.join(mdir, fn), "model:" + fn[:-3]))
    ddir = os.path.join(REF, "data")
    for fn in sorted(os.listdir(ddir)):
        if fn.endswith("_dataset.py") or fn == "base_dataset.py":
            sources.append((os.path.join(ddir, fn), "dataset:" + fn[:-3]))

    order = 0
    for path, scope in sources:
        if not os.path.exists(path):
            continue
        for spec in extract_file(path, scope):
            key = spec["name"]
            if key in registry:
                registry[key].setdefault("scopes", []).append(spec["scope"])
                continue
            spec["scopes"] = [spec.pop("scope")]
            spec["order"] = order
            order += 1
            registry[key] = spec

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/dev/stdout"
    with open(out_path, "w") as f:
        json.dump(registry, f, indent=1, sort_keys=True)
    print(f"extracted {len(registry)} flags -> {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
