"""SSL-mode driver (parity with MultiKE_Late.run, MultiKE_Late.py:201-280).

Phase 1 (``max_epoch``): multi-view + cross-KG streams with eval/predicate/
neighbor cadences. Phase 2 (``shared_learning_max_epoch``): shared space
mapping only. Then save + full test sweep including WVA.
"""
from __future__ import annotations

from multike_tpu.eval import views as vw
from multike_tpu.train.trainer import MultiKETrainer


class MultiKE_SSL(MultiKETrainer):
    """SSL == class MultiKE_Late in the reference."""

    def run(self):
        """Wraps the epoch loop so an interrupt/preemption still leaves a
        resumable checkpoint (beyond the reference's final-save-only)."""
        try:
            return self._run()
        except BaseException:
            if self.cfg.checkpoint_dir and \
                    not self.checkpoint_needs_collective():
                self.save_checkpoint_tag("ssl_interrupt", -1)
                self._log("interrupted: wrote ssl_interrupt checkpoint")
            raise

    def _run(self):
        cfg = self.cfg
        kgs = self.kgs

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

        start_epoch = self.try_resume("ssl")
        if start_epoch == 0:
            vw.valid(self, embed_choice="nv")
            vw.valid(self, embed_choice="avg")
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

            if i >= cfg.start_valid and i % cfg.eval_freq == 0:
                mrr_rv = vw.valid(self, embed_choice="rv")
                mrr_av = vw.valid(self, embed_choice="av")
                mrr_avg = vw.valid(self, embed_choice="avg")
                vw.valid_WVA(self)
                self.metrics.record(stream="valid", epoch=i, mrr_rv=mrr_rv,
                                    mrr_av=mrr_av, mrr_avg=mrr_avg)
                if i >= cfg.start_predicate_soft_alignment:
                    pam.update_predicate_alignment(self.current_embeds("rel"))
                    pam.update_predicate_alignment(self.current_embeds("attr"),
                                                   predicate_type="attribute")
                    cross_kg_relation_inference = (
                        pam.sup_relation_alignment_triples1
                        + pam.sup_relation_alignment_triples2)
                    cross_kg_attribute_inference = (
                        pam.sup_attribute_alignment_triples1
                        + pam.sup_attribute_alignment_triples2)

            if i == cfg.max_epoch:
                break

            if cfg.neg_sampling == "truncated" and i % cfg.truncated_freq == 0:
                assert 0.0 < cfg.truncated_epsilon < 1.0
                self.generate_neighbors()

            if cfg.checkpoint_freq and i % cfg.checkpoint_freq == 0:
                self.save_checkpoint_tag("ssl", i)

        for i in range(1, cfg.shared_learning_max_epoch + 1):
            self.train_shared_space_mapping_1epo(i, entity_list)
            if i >= cfg.start_valid and i % cfg.eval_freq == 0:
                vw.valid(self, embed_choice="final")

        if cfg.is_save:
            self.save()
        results = {
            "nv": vw.test(self, embed_choice="nv"),
            "rv": vw.test(self, embed_choice="rv"),
            "av": vw.test(self, embed_choice="av"),
            "avg": vw.test(self, embed_choice="avg"),
            "wva": vw.test_WVA(self),
            "final": vw.test(self, embed_choice="final"),
        }
        return results
