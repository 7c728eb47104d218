from gpe_tpu.viz.plots import (  # noqa: F401
    use_publication_style, plot_wavefunctions, plot_mu_vs_gamma,
    plot_loss_history, plot_epochs_heatmap, plot_method_comparison,
    plot_solution_2d, plot_thomas_fermi_overlay, plot_mode0_cross_potential,
)
