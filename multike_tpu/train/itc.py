"""ITC-mode driver (parity with MultiKE_CV.run, MultiKE_CSL.py:36-107).

Per epoch: relation view + cross-KG rel entity inference (+ soft relation
inference after epoch 10), attribute view + cross-KG attr entity inference
(+ soft attribute inference), common-space learning; eval every ``eval_freq``
epochs from ``start_valid``; predicate-alignment refresh every 10 epochs from
``start_predicate_soft_alignment``; truncated-neighbor refresh every
``truncated_freq`` epochs. Note the reference nests the early-stop check
inside the eval-cadence branch (MultiKE_CSL.py:72-78) — kept, but armed
only when ``Config.enable_early_stop`` is set (the reference's own check
compares against an always-False flag, so it trains to max_epoch; that is
our default too).
"""
from __future__ import annotations

from multike_tpu.eval import views as vw
from multike_tpu.eval.evaluation import early_stop
from multike_tpu.train.trainer import MultiKETrainer


class MultiKE_ITC(MultiKETrainer):
    """ITC == class MultiKE_CV in the reference (file/mode naming gotcha,
    SURVEY.md §1)."""

    def run(self):
        """Wraps the epoch loop so an interrupt/preemption still leaves a
        resumable checkpoint (beyond the reference's final-save-only)."""
        try:
            return self._run()
        except BaseException:
            if self.cfg.checkpoint_dir and \
                    not self.checkpoint_needs_collective():
                self.save_checkpoint_tag("itc_interrupt", -1)
                self._log("interrupted: wrote itc_interrupt checkpoint")
            raise

    def _run(self):
        cfg = self.cfg
        kgs = self.kgs
        flag1 = flag2 = -1
        should_stop = False

        cross_kg_relation_triples = (kgs.kg1.sup_relation_triples_list
                                     + kgs.kg2.sup_relation_triples_list)
        cross_kg_attr_entity_triples = (kgs.kg1.sup_attribute_triples_list
                                        + kgs.kg2.sup_attribute_triples_list)
        pam = self.predicate_align_model
        cross_kg_relation_inference = (pam.sup_relation_alignment_triples1
                                       + pam.sup_relation_alignment_triples2)
        cross_kg_attribute_inference = (pam.sup_attribute_alignment_triples1
                                        + pam.sup_attribute_alignment_triples2)
        entity_list = kgs.kg1.entities_list + kgs.kg2.entities_list

        start_epoch = self.try_resume("itc")
        if start_epoch == 0:
            vw.test(self, embed_choice="nv")
        for i in range(start_epoch + 1, cfg.max_epoch + 1):
            self._log(f"epoch {i}:")
            self.train_relation_view_1epo(i)
            self.train_cross_kg_entity_inference_relation_view_1epo(
                i, cross_kg_relation_triples)
            if i > cfg.start_predicate_soft_alignment:
                self.train_cross_kg_relation_inference_1epo(
                    i, cross_kg_relation_inference)

            self.train_attribute_view_1epo(i)
            self.train_cross_kg_entity_inference_attribute_view_1epo(
                i, cross_kg_attr_entity_triples)
            if i > cfg.start_predicate_soft_alignment:
                self.train_cross_kg_attribute_inference_1epo(
                    i, cross_kg_attribute_inference)
            self.train_common_space_learning_1epo(i, entity_list)

            if i >= cfg.start_valid and i % cfg.eval_freq == 0:
                mrr_rv = vw.valid(self, embed_choice="rv")
                mrr_av = vw.valid(self, embed_choice="av")
                hits1, mrr = vw.valid_metrics(self, embed_choice="final")
                # per-epoch eval trajectory in the metrics jsonl (the
                # long-schedule artifact reads it back; SURVEY.md §5)
                self.metrics.record(stream="valid", epoch=i, mrr_rv=mrr_rv,
                                    mrr_av=mrr_av, mrr_final=mrr)
                if cfg.enable_early_stop:
                    # two-step decline of cfg.stop_metric; the reference
                    # defines but never arms this rule (MultiKE_CSL.py:77-78)
                    watched = mrr if cfg.stop_metric == "mrr" else hits1
                    flag1, flag2, should_stop = early_stop(
                        flag1, flag2, watched)
                if should_stop or i == cfg.max_epoch:
                    break

            if (i >= cfg.start_predicate_soft_alignment and i % 10 == 0):
                pam.update_predicate_alignment(self.current_embeds("rel"))
                pam.update_predicate_alignment(self.current_embeds("attr"),
                                               predicate_type="attribute")
                cross_kg_relation_inference = (
                    pam.sup_relation_alignment_triples1
                    + pam.sup_relation_alignment_triples2)
                cross_kg_attribute_inference = (
                    pam.sup_attribute_alignment_triples1
                    + pam.sup_attribute_alignment_triples2)

            if cfg.neg_sampling == "truncated" and i % cfg.truncated_freq == 0:
                assert 0.0 < cfg.truncated_epsilon < 1.0
                self.generate_neighbors()

            if cfg.checkpoint_freq and i % cfg.checkpoint_freq == 0:
                self.save_checkpoint_tag("itc", i)

        if cfg.is_save:
            self.save()
        results = {
            "nv": vw.test(self, embed_choice="nv"),
            "rv": vw.test(self, embed_choice="rv"),
            "av": vw.test(self, embed_choice="av"),
            "final": vw.test(self, embed_choice="final"),
        }
        return results
