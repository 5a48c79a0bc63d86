"""Web UI entry point (parity: reference launch.py:212-238).

Default = gradio app (matching the reference); `--no-gradio` serves the
same design+retro flow through the dependency-free stdlib server
(webui/server.py) — gradio is not installable offline, and when it is
absent entirely the entry point falls back to the stdlib server with a
notice instead of dying."""

import sys

from llamole_tpu.utils.logging import get_logger

logger = get_logger(__name__)

DRUG_PROPS = ["BBBP", "HIV", "BACE"]
MATERIAL_PROPS = ["CO2", "N2", "O2", "FFV", "TC"]
SYNTH_PROPS = ["SC", "SA"]


def build_app(config_path: str):
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            "gradio is not installed in this environment; install it or "
            "use `python main.py eval <config>` for batch runs.") from e

    from llamole_tpu.webui.workflow import (
        generate, load_model_and_tokenizer, process_input)

    state = load_model_and_tokenizer(config_path)

    def run(instruction, *prop_values):
        props = {}
        for name, val in zip(DRUG_PROPS + MATERIAL_PROPS + SYNTH_PROPS,
                             prop_values):
            if val is not None and val != "NAN" and val != 0:
                props[name] = float(val)
        batch = process_input(state, instruction, props)
        info = generate(state, batch)
        text = "".join(t for t in info["text_lists"][0] if t)
        smiles = info["smiles_list"][0]
        plan = info["retro_plan_dict"].get(smiles, {})
        reactions = "\n".join(plan.get("reaction_list") or [])
        mol_svg, rxn_svg = render_molecule_and_route(
            smiles, plan.get("reaction_list") or [])
        return smiles or "<NO MOLECULE>", text, reactions, mol_svg, rxn_svg

    # input widgets (parity: webui/elements.py:21-95 — drug radios
    # {0,1,NAN}, material sliders with 0 = unconditioned, SC/SA sliders)
    inputs = [gr.Textbox(label="Instruction", lines=3)]
    for p in DRUG_PROPS:
        inputs.append(gr.Radio(["0", "1", "NAN"], value="NAN", label=p))
    for p in MATERIAL_PROPS:
        inputs.append(gr.Slider(0.0, 10.0, value=0.0, label=f"{p} (0 = off)"))
    inputs.append(gr.Slider(1.0, 5.0, value=3.0, label="SC"))
    inputs.append(gr.Slider(1.0, 10.0, value=3.0, label="SA"))

    app = gr.Interface(
        fn=run,
        inputs=inputs,
        outputs=[gr.Textbox(label="SMILES"),
                 gr.Textbox(label="LLM response"),
                 gr.Textbox(label="Retrosynthesis route"),
                 gr.HTML(label="Molecule"),
                 gr.HTML(label="Reactions")],
        title="Llamole-TPU: inverse molecular design + retrosynthesis",
    )
    return app


def render_molecule_and_route(smiles, reaction_list):
    """First-party SVG depictions of the designed molecule and each retro
    step (reference renders these with RDKit Draw, launch.py:175-187)."""
    from llamole_tpu.chem.depict import mol_to_svg, reaction_to_svg

    mol_svg = (mol_to_svg(smiles) if smiles else None) or ""
    steps = []
    for rxn in reaction_list or []:
        if ">>" not in rxn:
            continue
        product, reactants = rxn.split(">>", 1)
        svg = reaction_to_svg(product.strip(),
                              [r.strip() for r in reactants.split(".")])
        if svg:
            steps.append(svg)
    return mol_svg, "<br/>".join(steps)


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    config = argv[0] if argv else "config/generate/llama_drug.yaml"
    use_stdlib = "--no-gradio" in flags
    if not use_stdlib:
        try:
            import gradio  # noqa: F401
        except ImportError:
            logger.warning("gradio not installed; serving the stdlib UI "
                           "instead (launch.py --no-gradio)")
            use_stdlib = True
    if use_stdlib:
        from llamole_tpu.webui.server import build_server
        port = 7860
        for a in flags:
            if a.startswith("--port="):
                port = int(a.split("=", 1)[1])
        build_server(config, port=port).serve_forever()
    else:
        build_app(config).launch()
